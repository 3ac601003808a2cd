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
    e0 = sampling.sample_pos_edges(pos, percent=50, epoch=0, seed=42)
    e1 = sampling.sample_pos_edges(pos, percent=50, epoch=1, seed=42)
    e2 = sampling.sample_pos_edges(pos, percent=50, epoch=2, seed=42)
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
    neg = sampling.sample_neg_edges_local(pos, 100, neg_ratio=2, rng=rng)
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
