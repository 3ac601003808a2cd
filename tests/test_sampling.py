"""Ego-k-hop sampling, negative sampling, link-prediction datasets."""

import numpy as np
import pytest

from graphgpt_tpu.data import sampling
from graphgpt_tpu.data.datasets import erdos_renyi_graph
from graphgpt_tpu.data.graph import Graph


@pytest.fixture(scope="module")
def big_graph():
    rng = np.random.default_rng(0)
    g = erdos_renyi_graph(rng, 200, 0.05)
    g.node_attr = rng.integers(0, 5, size=(200, 2)).astype(np.int32)
    g.edge_attr = rng.integers(0, 3, size=(g.num_edges, 1)).astype(np.int32)
    return g


def test_ego_k_hop_contains_seed_and_respects_depth(big_graph):
    indptr, indices, _ = sampling.build_csr_directed(
        big_graph.num_nodes, big_graph.edge_index
    )
    rng = np.random.default_rng(0)
    nodes = sampling.ego_k_hop(indptr, indices, [5], depth=1, fanout=4, rng=rng)
    assert 5 in nodes
    # depth-1: all non-seed nodes must be direct neighbors of the seed
    nbrs = set(indices[indptr[5] : indptr[6]].tolist()) | {5}
    assert set(nodes.tolist()) <= nbrs
    assert len(nodes) <= 5  # seed + fanout


def test_induced_subgraph_edges_match(big_graph):
    nodes = np.asarray([1, 5, 9, 20, 40], np.int64)
    sub_ei, eids = sampling.induced_subgraph(big_graph, nodes)
    # every extracted edge maps back to an original edge between the nodes
    for col, eid in zip(sub_ei.T, eids):
        a, b = nodes[col[0]], nodes[col[1]]
        assert big_graph.edge_index[0][eid] == a
        assert big_graph.edge_index[1][eid] == b


def test_pos_edge_cyclic_subsets():
    pos = np.arange(100).reshape(50, 2)
    e0, _ = sampling.sample_pos_edges(pos, percent=50, epoch=0, seed=42)
    e1, _ = sampling.sample_pos_edges(pos, percent=50, epoch=1, seed=42)
    e2, _ = sampling.sample_pos_edges(pos, percent=50, epoch=2, seed=42)
    assert e0.shape[0] == 25 and e1.shape[0] == 25
    # epochs 0 and 1 partition the permutation: disjoint
    s0 = {tuple(r) for r in e0}
    s1 = {tuple(r) for r in e1}
    assert not (s0 & s1)
    # epoch 2 starts a new cycle with a new seed
    assert e2.shape[0] == 25


def test_global_negatives_avoid_existing(big_graph):
    rng = np.random.default_rng(0)
    neg = sampling.sample_neg_edges_global(
        big_graph.num_nodes, big_graph.edge_index, 100, rng
    )
    existing = {
        (int(a), int(b))
        for a, b in zip(big_graph.edge_index[0], big_graph.edge_index[1])
    }
    for a, b in neg:
        assert a != b
        assert (int(a), int(b)) not in existing


def test_local_negatives_share_an_endpoint():
    pos = np.asarray([[1, 2], [3, 4]], np.int64)
    rng = np.random.default_rng(0)
    neg, _ = sampling.sample_neg_edges_local(pos, 100, neg_ratio=2, rng=rng)
    assert neg.shape == (4, 2)
    pos_nodes = {1, 2, 3, 4}
    assert all(int(a) in pos_nodes or int(b) in pos_nodes for a, b in neg)


def test_edge_dataset_removes_target_edge(big_graph):
    ds = sampling.EgoEdgeDataset(
        big_graph, depth_neighbors=[(1, 10)], neg_ratio=1, seed=0
    )
    # find a positive sample
    pos_i = int(np.flatnonzero(ds.edges_with_y[:, 2] == 1)[0])
    g = ds[pos_i]
    src, dst = g.root_n_id
    fwd = (g.edge_index[0] == src) & (g.edge_index[1] == dst)
    bwd = (g.edge_index[0] == dst) & (g.edge_index[1] == src)
    assert not fwd.any() and not bwd.any()
    assert g.y[0] == 1
    # attrs sliced consistently
    assert g.node_attr.shape[0] == g.num_nodes
    assert g.edge_attr.shape[0] == g.num_edges


def test_edge_dataset_reset_changes_negatives(big_graph):
    ds = sampling.EgoEdgeDataset(
        big_graph, depth_neighbors=[(1, 10)], neg_ratio=1, percent=50, seed=0
    )
    ds.reset_samples(0, 42)
    n0 = ds.edges_with_y.copy()
    ds.reset_samples(1, 42)
    n1 = ds.edges_with_y
    # different epoch -> different positive subset and fresh negatives
    # (sizes may differ by one from rounding of the cyclic partition)
    s0 = {tuple(r) for r in n0[n0[:, 2] == 1][:, :2]}
    s1 = {tuple(r) for r in n1[n1[:, 2] == 1][:, :2]}
    assert not (s0 & s1)  # percent=50 cycle partitions positives disjointly


def test_node_dataset(big_graph):
    big_graph.y = np.arange(big_graph.num_nodes, dtype=np.int64)
    ds = sampling.EgoNodeDataset(big_graph, depth_neighbors=[(2, 5)], seed=1)
    g = ds[7]
    root_local = int(g.root_n_id[0])
    assert g.y[root_local, 0] == 7  # label of seed node preserved
    assert g.num_nodes >= 1


def test_edge_dataset_tokenizes(big_graph):
    """Edge subgraphs flow through the stacked tokenizer edge task."""
    from graphgpt_tpu.config import TokenizationConfig
    from graphgpt_tpu.data import vocab as V
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 2
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 1
    vm = V.vocab_map_from_list(
        V.build_vocab(cfg, [np.arange(5)] * 2, [np.arange(3)])
    )
    tok = StackedGSTTokenizer(cfg, vm, task_type="edge")
    ds = sampling.EgoEdgeDataset(big_graph, depth_neighbors=[(1, 8)], seed=0)
    rng = np.random.default_rng(0)
    s = tok(ds[0], rng)
    assert s.edge_labels is not None
    assert s.input_ids.shape[1] == 4  # 1 + 2 + 1


def test_structured_eval_negatives_grouping(big_graph):
    """[N_pos, K, 2] fixed negatives carry their positive's group index."""
    ei = big_graph.edge_index
    mask = ei[0] < ei[1]
    pos = ei[:, mask].T.astype(np.int64)[:5]
    rng = np.random.default_rng(0)
    neg = rng.integers(0, big_graph.num_nodes, size=(5, 3, 2))
    ds = sampling.EgoEdgeDataset(
        big_graph, depth_neighbors=[(1, 8)], pos_edges=pos, neg_edges=neg, seed=0
    )
    assert len(ds) == 5 + 15
    assert ds.group_idx is not None
    # positive i groups to i; its negatives share the group
    g_pos = ds[2]
    assert int(g_pos.extra["eval_group"][0]) == 2
    g_neg = ds[5 + 3 * 2]  # first negative of positive 2
    assert int(g_neg.extra["eval_group"][0]) == 2
    # flows through the tokenizer into extras
    from graphgpt_tpu.config import TokenizationConfig
    from graphgpt_tpu.data import vocab as V
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 2
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 1
    vm = V.vocab_map_from_list(V.build_vocab(cfg, [np.arange(5)] * 2, [np.arange(3)]))
    tok = StackedGSTTokenizer(cfg, vm, task_type="edge")
    s = tok(g_neg, np.random.default_rng(0))
    assert int(s.extras["eval_group"][0]) == 2


def _kg_graph(n=60, rels=5, seed=0):
    rng = np.random.default_rng(seed)
    g = erdos_renyi_graph(rng, n, 0.08)
    rel = rng.integers(0, rels, g.num_edges).astype(np.int64)
    g.edge_attr = np.stack([np.ones_like(rel), rel], axis=1).astype(np.int32)
    return g, rng


def test_wikikg2_sample_weights_inverse_freq():
    """sample_wgt: wgt = sqrt(1 / (cnt(h,r) + cnt(t,-r-1))), base count 4
    (reference dataset_map.py:369-388, 451-469)."""
    g, rng = _kg_graph()
    ei = g.edge_index
    mask = ei[0] < ei[1]
    pos = ei[:, mask].T.astype(np.int64)
    rel = np.zeros(len(pos), np.int64)
    rel[0] = 1  # one odd relation
    pos_attr = np.stack([np.ones_like(rel), rel], axis=1)
    ds = sampling.EgoEdgeDataset(
        g, depth_neighbors=[(1, 8)], pos_edges=pos, pos_edge_attr=pos_attr,
        method="local", sample_wgt=True, seed=0,
    )
    assert ds.wgt is not None and ds.wgt.shape[0] == len(ds)
    # recompute the expected weight for positive sample 1 by hand
    i = 1
    h, t, _y = ds.edges_with_y[i]
    r = ds.all_edge_attr[i, 1]
    cnt_h = 4 + int(((pos[:, 0] == h) & (rel == r)).sum())
    cnt_t = 4 + int(((pos[:, 1] == t) & (rel == r)).sum())
    assert np.isclose(ds.wgt[i], np.sqrt(1.0 / (cnt_h + cnt_t)))
    # weights flow onto the sampled graphs
    assert ds[i].wgt == pytest.approx(float(ds.wgt[i]))


def test_wikikg2_negatives_carry_relation_attrs():
    """Local head/tail corruption keeps the positive's relation; target
    edge attrs ride on graph.tgt_edge_attr (dataset_map.py:548-550)."""
    g, rng = _kg_graph(seed=1)
    ei = g.edge_index
    mask = ei[0] < ei[1]
    pos = ei[:, mask].T.astype(np.int64)
    rel = np.arange(len(pos), dtype=np.int64) % 3
    pos_attr = np.stack([np.ones_like(rel), rel], axis=1)
    ds = sampling.EgoEdgeDataset(
        g, depth_neighbors=[(1, 8)], pos_edges=pos, pos_edge_attr=pos_attr,
        method="local", seed=0,
    )
    assert ds.all_edge_attr is not None
    assert ds.all_edge_attr.shape[0] == len(ds)
    n_pos = len(pos)
    # negatives' relation values come from the positive attr pool
    assert set(ds.all_edge_attr[n_pos:, 1].tolist()) <= set(rel.tolist())
    gs = ds[0]
    assert gs.tgt_edge_attr is not None and gs.tgt_edge_attr.shape == (2,)


def test_edge_task_injects_relation_tokens():
    """Stacked edge task: dst row carries the target relation's edge-attr
    tokens, src row the defaults, order NOT shuffled (reference
    tokenizer_utils.py:570-633)."""
    from graphgpt_tpu.config import TokenizationConfig
    from graphgpt_tpu.data import vocab as V
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    g, rng = _kg_graph(seed=2)
    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 2
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 2
    g.node_attr = np.random.default_rng(3).integers(0, 5, (g.num_nodes, 2)).astype(np.int32)
    vm = V.vocab_map_from_list(V.build_vocab(cfg, [np.arange(5)] * 2, [np.arange(6), np.arange(6)]))
    tok = StackedGSTTokenizer(cfg, vm, task_type="edge")
    sub = Graph(
        num_nodes=g.num_nodes, edge_index=g.edge_index, node_attr=g.node_attr,
        edge_attr=g.edge_attr % 6, y=np.asarray([1]), root_n_id=np.asarray([0, 1]),
    )
    sub.tgt_edge_attr = np.asarray([1, 3])
    for seed in range(4):
        s = tok(sub, np.random.default_rng(seed))
        src_row, dst_row = s.input_ids[-2], s.input_ids[-1]
        # src row: default edge-attr ids; dst row: tokens of [1, 3]
        np.testing.assert_array_equal(src_row[-2:], tok.edge_lookup.default_ids)
        exp = tok.edge_lookup(np.asarray([[1, 3]]))[0]
        np.testing.assert_array_equal(dst_row[-2:], exp)
        # order stays src,dst across seeds (no shuffle with target attrs)
        walk_first = {int(src_row[0]), int(dst_row[0])}
        assert len(walk_first) == 2


def test_proteins_species_mask_and_root_x_mask(tmp_path):
    """Reader-constructed species closure + root x_mask (reference
    node_level.py:276-309, dataset_map.py:253-258)."""
    from graphgpt_tpu import readers
    from graphgpt_tpu.config import Config

    rng = np.random.default_rng(4)
    g = erdos_renyi_graph(rng, 40, 0.15)
    species = np.repeat(np.arange(4), 10).astype(np.int64)
    # node_attr = [species, local_id, label-as-feat column]
    attr = np.stack([species, np.arange(40) % 10 + 1, np.arange(40) + 7], axis=1)
    d = tmp_path / "ogbn-proteins"
    d.mkdir(parents=True)
    np.savez(
        d / "big_graph.npz",
        edge_index=g.edge_index.astype(np.int32),
        num_nodes=np.int64(40),
        node_attr=attr.astype(np.int32),
        node_species=species,
        y=np.zeros((40, 2), np.int64),
        train_idx=np.arange(40, dtype=np.int64),
        x_mask=np.asarray([1, 1, 0], np.int64),
    )
    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    ds = readers.read_dataset("ogbn-proteins", cfg, data_split="train")
    gs = ds[3]
    root = int(gs.root_n_id[0])
    tgt_species = gs.extra["node_species"][root]
    same = gs.extra["node_species"] == tgt_species
    # same-species nodes (incl. root) have col>=2 zeroed; others keep theirs
    assert (gs.node_attr[same, 2] == 0).all()
    other = ~same
    if other.any():
        assert (gs.node_attr[other, 2] != 0).all()
    # id columns never masked
    assert (gs.node_attr[:, 0] == gs.extra["node_species"]).all()
