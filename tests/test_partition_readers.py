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
