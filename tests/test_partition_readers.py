"""Partitioner, node-level datasets, readers registry."""

import numpy as np
import pytest

from graphgpt_tpu.config import Config
from graphgpt_tpu.data.datasets import erdos_renyi_graph
from graphgpt_tpu.data.partition import (
    EnsembleDataset,
    PartitionDataset,
    RandomEdgesDataset,
    RandomNodesDataset,
    bfs_partition,
)


@pytest.fixture(scope="module")
def big():
    rng = np.random.default_rng(0)
    g = erdos_renyi_graph(rng, 300, 0.03)
    g.node_attr = rng.integers(0, 5, size=(300, 2)).astype(np.int32)
    g.y = rng.integers(0, 3, size=(300, 1)).astype(np.int64)
    return g


def test_bfs_partition_covers_all_nodes(big):
    rng = np.random.default_rng(0)
    parts = bfs_partition(big, 8, rng)
    all_nodes = np.concatenate(parts)
    assert len(all_nodes) == big.num_nodes
    assert len(np.unique(all_nodes)) == big.num_nodes
    # roughly balanced by edges: no part holds > 60% of nodes
    assert max(len(p) for p in parts) < 0.6 * big.num_nodes


def test_partition_dataset_reset_changes(big):
    ds = PartitionDataset(big, num_parts=6, seed=0)
    n0 = len(ds)
    g = ds[0]
    assert g.num_nodes > 0 and g.node_attr is not None
    parts0 = [p.copy() for p in ds.parts]
    ds.reset_samples(1)
    changed = len(ds.parts) != len(parts0) or any(
        not np.array_equal(a, b) for a, b in zip(parts0, ds.parts)
    )
    assert changed


def test_random_nodes_edges(big):
    ds = RandomNodesDataset(big, 30, 10, seed=0)
    g = ds[0]
    assert g.num_nodes <= 30
    ds2 = RandomEdgesDataset(big, 40, 10, seed=0)
    g2 = ds2[0]
    assert g2.num_edges > 0
    # y is sliced per node
    assert g2.y.shape[0] == g2.num_nodes


def test_ensemble_dispatch(big):
    a = RandomNodesDataset(big, 20, 5, seed=0)
    b = RandomEdgesDataset(big, 20, 7, seed=0)
    ens = EnsembleDataset([a, b])
    assert len(ens) == 12
    g = ens[6]
    assert int(g.extra["idx_of_ds"]) == 1
    g = ens[2]
    assert int(g.extra["idx_of_ds"]) == 0


def test_readers_registry():
    from graphgpt_tpu import readers

    cfg = Config()
    ds = readers.read_dataset("synthetic_mol", cfg)
    assert len(ds) == 50_000
    ds = readers.read_dataset("structure_er", cfg, size=100)
    assert len(ds) == 100
    g = ds[5]
    assert g.num_nodes >= 8
    with pytest.raises(FileNotFoundError):
        readers.read_dataset("ogbl-ppa", cfg)
    with pytest.raises(KeyError):
        readers.read_dataset("no-such-dataset", cfg)


def test_npz_roundtrip(tmp_path, big):
    """Edge-level reader consumes the documented npz contract."""
    from graphgpt_tpu import readers

    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    d = tmp_path / "ogbl-ppa"
    d.mkdir()
    ei = big.edge_index
    mask = ei[0] < ei[1]
    pos = ei[:, mask].T.astype(np.int64)
    np.savez(
        d / "big_graph.npz",
        edge_index=big.edge_index,
        num_nodes=big.num_nodes,
        node_attr=big.node_attr,
        train_edge=pos[:100],
        valid_edge=pos[100:120],
        valid_edge_neg=np.stack([pos[100:120, 1], pos[100:120, 0]], 1),
    )
    ds = readers.read_dataset("ogbl-ppa", cfg)
    assert len(ds) > 0
    g = ds[0]
    assert g.root_n_id is not None and len(g.root_n_id) == 2
    ds_val = readers.read_dataset("ogbl-ppa", cfg, data_split="valid")
    ys = ds_val.edges_with_y[:, 2]
    assert (ys == 1).sum() == 20 and (ys == 0).sum() == 20


def _graphs_npz(path, n_graphs=40, seed=0):
    """Small graph-level store with a few degenerate molecules."""
    rng = np.random.default_rng(seed)
    node_attr, edge_cols, node_ptr, edge_ptr, ys = [], [], [0], [0], []
    for g in range(n_graphs):
        if g == 1:
            n, ei = 1, np.zeros((2, 0), np.int64)  # single-node molecule
        elif g == 2:
            n, ei = 4, np.zeros((2, 0), np.int64)  # edge-free molecule
        elif g == 3:
            # disconnected: two 2-cliques
            n = 4
            ei = np.asarray([[0, 1, 2, 3], [1, 0, 3, 2]], np.int64)
        else:
            n = int(rng.integers(4, 25))
            src = np.arange(n - 1)
            ei = np.stack([np.concatenate([src, src + 1]),
                           np.concatenate([src + 1, src])])
        node_attr.append(rng.integers(0, 5, size=(n, 2)).astype(np.int32))
        edge_cols.append(ei + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + n)
        edge_ptr.append(edge_ptr[-1] + ei.shape[1])
        ys.append(float(g))
    np.savez(
        path,
        node_attr=np.concatenate(node_attr),
        edge_index=np.concatenate(edge_cols, axis=1).astype(np.int32),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        y=np.asarray(ys, np.float32)[:, None],
        train_idx=np.arange(0, 24, dtype=np.int64),
        valid_idx=np.arange(24, 36, dtype=np.int64),
        test_idx=np.arange(36, 40, dtype=np.int64),
    )


def test_split_policies(tmp_path):
    """PCQM4M-v2 split manipulations (reference pcqm4mv2.py:344-428)."""
    from graphgpt_tpu import readers

    d = tmp_path / "pcqm4m-v2"
    d.mkdir()
    _graphs_npz(d / "graphs.npz")
    store = readers.NpzGraphStore(str(d / "graphs.npz"))
    base = (np.arange(0, 24), np.arange(24, 36), np.arange(36, 40))

    # remove_special drops the single-node / edge-free / disconnected graphs
    tr, va, te = readers.apply_split_policies(
        store, base,
        {"remove_special": {"edge0": True, "node1": True, "disconnected": True}},
    )
    assert 1 not in tr and 2 not in tr and 3 not in tr
    assert len(tr) == 21 and len(va) == 12

    # true_valid: valid mixed into train, num_remained kept as new valid
    tr, va, te = readers.apply_split_policies(
        store, base, {"true_valid": True, "num_remained": 4}
    )
    assert len(va) == 4
    assert len(tr) == 24 + 12 - 4
    assert len(te) == 4  # seen-valid test probe
    assert set(va).isdisjoint(set(tr) - set(base[0]))

    # test_large: large-molecule valid subset becomes test
    tr, va, te = readers.apply_split_policies(
        store, base, {"test_large": True, "large_threshold": 18}
    )
    node_cnt = np.diff(store._node_ptr)
    assert all(node_cnt[i] > 18 for i in te)

    # duplicate_train
    tr, va, te = readers.apply_split_policies(store, base, {"duplicate_train": 3})
    assert len(tr) == 72

    # end-to-end through the registry with cfg.tokenization.dataset_policy
    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    cfg.tokenization.dataset_policy = {"true_valid": True, "num_remained": 4}
    ds = readers.read_dataset("pcqm4m-v2", cfg)
    tr, va, te = ds.splits()
    assert len(va) == 4


def test_spice2graph(tmp_path):
    """Netlist -> circuit graph conversion (reference
    spice2graph_full_utils.py + SpiceCircuitDataset)."""
    import sys
    sys.path.insert(0, "tools")
    import spice2graph as s2g

    root = tmp_path / "raw"
    (root / "1").mkdir(parents=True)
    (root / "1" / "1.cir").write_text(
        "M1 (net1 IN net2 VSS) nmos4\nR1 (net1 VDD) resistor\n"
    )
    (root / "1" / "Port1.txt").write_text("IN VDD VSS\n")
    (root / "graph-labels.csv").write_text("1\n")

    nodes, ei = s2g.netlist_to_graph(
        s2g.read_netlist(str(root / "1" / "1.cir")),
        s2g.read_ports(str(root / "1" / "Port1.txt")),
    )
    # 3 ports + nmos body+4 pins + resistor body+2 pins
    assert len(nodes) == 3 + 5 + 3
    idx = {n: i for i, n in enumerate(nodes)}
    pairs = set(map(tuple, ei.T.tolist()))
    assert (idx["NM1"], idx["NM1_D"]) in pairs  # body-pin
    assert (idx["NM1_G"], idx["IN"]) in pairs  # pin-port direct
    assert (idx["NM1_D"], idx["R1_P"]) in pairs  # shared internal net1
    assert (ei[0] != ei[1]).all()

    # symbol normalisation (v2 vocabulary)
    assert s2g.normalize_symbol("NM1") == "NM"
    assert s2g.normalize_symbol("NM1_D") == "_D"
    assert s2g.normalize_symbol("TRANSMISSION_GATE2_VDD") == "_VDD"
    assert s2g.normalize_symbol("VDD") == "VDD"

    # full conversion emits the npz contract consumable by the reader
    out = s2g.convert(str(root), str(tmp_path / "conv"))
    from graphgpt_tpu import readers

    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path / "conv")
    ds = readers.read_dataset("spice-circuit", cfg)
    g = ds[0]
    assert g.num_nodes == 11 and g.node_attr.shape == (11, 1)


def _aux_npz(path, n_graphs=10, y_cols=7, seed=5):
    rng = np.random.default_rng(seed)
    node_attr, edge_cols, node_ptr, edge_ptr = [], [], [0], [0]
    for _ in range(n_graphs):
        n = int(rng.integers(4, 12))
        src = np.arange(n - 1)
        ei = np.stack([np.concatenate([src, src + 1]),
                       np.concatenate([src + 1, src])])
        node_attr.append(rng.integers(0, 5, size=(n, 2)).astype(np.int32))
        edge_cols.append(ei + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + n)
        edge_ptr.append(edge_ptr[-1] + ei.shape[1])
    y = rng.normal(size=(n_graphs, y_cols)).astype(np.float32)
    y[0, :] = np.nan  # exercises nan_to_num
    np.savez(
        path,
        node_attr=np.concatenate(node_attr),
        edge_index=np.concatenate(edge_cols, axis=1).astype(np.int32),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        y=y,
    )
    return y


def test_pcqm_cepdb_zinc_ensembling(tmp_path):
    """add_cepdb/add_zinc wrap the train split in an ensemble with the
    reference's y-column selection (CEPDB y[:,5], ZINC y[:,2], nan->0;
    _readers/pcqm4mv2.py:120-157). valid/test stay on the base dataset."""
    from graphgpt_tpu import readers
    from graphgpt_tpu.config import Config

    base_dir = tmp_path / "pcqm4m-v2"
    base_dir.mkdir()
    _graphs_npz(base_dir / "graphs.npz")
    (tmp_path / "CEPDB").mkdir()
    y_cep = _aux_npz(tmp_path / "CEPDB" / "graphs.npz", n_graphs=10)
    (tmp_path / "ZINC").mkdir()
    y_zinc = _aux_npz(tmp_path / "ZINC" / "graphs.npz", n_graphs=6, seed=6)

    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    cfg.tokenization.dataset_policy = {"add_cepdb": True, "add_zinc": True}
    ds = readers.read_dataset("pcqm4m-v2", cfg)
    tr, va, te = ds.splits()
    assert len(ds) == 40 + 10 + 6
    assert len(tr) == 24 + 10 + 6  # aux appended to train only
    assert va.tolist() == list(range(24, 36)) and te.tolist() == list(range(36, 40))
    # y column selection with nan -> 0
    g_cep = ds[40]  # first CEPDB graph (graph 0 has nan y)
    assert float(np.nan_to_num(y_cep[0, 5])) == float(np.asarray(g_cep.y).reshape(-1)[0])
    g_zinc = ds[50 + 1]
    assert abs(float(y_zinc[1, 2]) - float(np.asarray(g_zinc.y).reshape(-1)[0])) < 1e-6
    assert g_cep.extra["idx_of_ds"] == 1 and g_zinc.extra["idx_of_ds"] == 2


def test_molhiv_golden_fixture_end_to_end(tmp_path):
    """Reader-contract pin (r3 verdict item 8): a golden ogbg-molhiv
    fixture generated from the documented npz schema (tools/convert_ogb.py
    convert_graph_level layout; OGB atom/bond featurisation dims 9/3 with
    the official cardinalities) flows reader -> vocab -> tokenizer ->
    loader -> one finetune step -> eval, pinning the contract against
    drift."""
    import jax

    from graphgpt_tpu.config import Config
    from graphgpt_tpu.data.datasets import MOL_EDGE_CARD, MOL_NODE_CARD
    from graphgpt_tpu.training.finetune import FinetunePipeline

    rng = np.random.default_rng(42)
    n_graphs = 32
    node_ptr, edge_ptr = [0], [0]
    xs, eis, eas, ys = [], [], [], []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 14))
        # ring + chords:连 a connected molecule-like graph, directed both ways
        src = np.arange(n)
        dst = np.roll(src, -1)
        # contract: global (node_ptr-offset) node ids
        ei = (
            np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
            + node_ptr[-1]
        )
        xs.append(
            np.stack([rng.integers(0, c, size=n) for c in MOL_NODE_CARD], axis=1)
        )
        eas.append(
            np.stack(
                [rng.integers(0, c, size=ei.shape[1]) for c in MOL_EDGE_CARD],
                axis=1,
            )
        )
        eis.append(ei)
        ys.append([float(len(ys) % 2)])  # molhiv: binary HIV label (balanced)
        node_ptr.append(node_ptr[-1] + n)
        edge_ptr.append(edge_ptr[-1] + ei.shape[1])
    # interleaved permutation keeps labels balanced inside every split
    idx = np.concatenate([np.arange(0, n_graphs, 2), np.arange(1, n_graphs, 2)])
    idx = idx.reshape(2, -1).T.reshape(-1)
    d = tmp_path / "data" / "ogbg-molhiv"
    d.mkdir(parents=True)
    np.savez(
        d / "graphs.npz",
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        node_attr=np.concatenate(xs).astype(np.int32),
        edge_index=np.concatenate(eis, axis=1).astype(np.int32),
        edge_attr=np.concatenate(eas).astype(np.int32),
        y=np.asarray(ys, np.float32),
        train_idx=idx[:16].astype(np.int64),
        valid_idx=idx[16:24].astype(np.int64),
        test_idx=idx[24:].astype(np.int64),
    )

    cfg = Config()
    cfg.tokenization.dataset = "ogbg-molhiv"
    cfg.tokenization.data_dir = str(tmp_path / "data")
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    cfg.model.hidden_size = 64
    cfg.model.num_hidden_layers = 2
    cfg.model.head_dim = 16
    cfg.model.dtype = "float32"
    cfg.model.problem_type = "single_label_classification"
    cfg.model.num_labels = 2
    cfg.training.task_type = "graph"
    cfg.training.batch_size = 8  # divisible over the 8-device test mesh
    cfg.training.max_length = 128
    cfg.training.num_workers = 0
    cfg.training.schedule.epochs = 1
    cfg.training.epoch_per_eval = 1
    cfg.training.output_dir = str(tmp_path / "run")
    pipe = FinetunePipeline(cfg)
    pipe.setup()
    assert len(pipe.train_idx) == 16 and len(pipe.valid_idx) == 8
    best = pipe.run()
    pipe.loader.close()
    assert any(k.startswith("valid_") for k in best), best
    vals = [v for k, v in best.items() if isinstance(v, float)]
    assert all(np.isfinite(v) for v in vals), best
