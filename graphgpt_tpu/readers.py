"""Dataset registry & readers (reference L0/L1: src/data/data_sources.py,
_graph_factory.py, _readers/{pcqm4mv2,edge_level,node_level}.py).

This environment has no network egress, so readers consume a documented
on-disk **npz contract** instead of downloading OGB archives:

Graph-level (`<data_dir>/<name>/graphs.npz`):
    node_attr   [sum_N, Dn] int
    edge_attr   [sum_E, De] int
    edge_index  [2, sum_E] int (node ids local per graph)
    node_ptr    [G+1], edge_ptr [G+1]
    y           [G, T] float
    pos         [sum_N, 3] float (optional)
    train_idx / valid_idx / test_idx  [.] int (optional; random split
    fallback mirrors DatasetSpec split handling, _graph_factory.py:19-160)

Edge-level (`<data_dir>/<name>/big_graph.npz`):
    edge_index [2, E], node_attr [N, Dn] (optional), edge_attr [E, De]
    (optional), train_edge [P, 2], valid_edge, test_edge,
    valid_edge_neg / test_edge_neg (fixed eval negatives)

Node-level: same big_graph.npz plus y [N, T] and split idx arrays.

`synthetic_mol` and `structure_er` generate data in-process for tests and
benchmarks.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .data.datasets import GraphsMapDataset, SyntheticMolDataset, erdos_renyi_graph
from .data.graph import Graph, GraphBatchStore
from .data.partition import EnsembleDataset, RandomEdgesDataset
from .data.sampling import EgoEdgeDataset, EgoNodeDataset
from .utils.registry import Register

_readers = Register()
read_dataset = _readers.build


class NpzGraphStore(GraphBatchStore):
    """Columnar many-graph storage loaded from the npz contract."""

    def __init__(self, path: str):
        data = np.load(path, allow_pickle=False)
        self._node_ptr = data["node_ptr"].astype(np.int64)
        self._edge_ptr = data["edge_ptr"].astype(np.int64)
        self.edge_index = data["edge_index"].astype(np.int32)
        self.node_attr = data["node_attr"].astype(np.int32) if "node_attr" in data else None
        self.edge_attr = data["edge_attr"].astype(np.int32) if "edge_attr" in data else None
        self._ys = data["y"].astype(np.float32) if "y" in data else None
        self._pos = data["pos"].astype(np.float32) if "pos" in data else None
        self.splits = {
            k: data[f"{k}_idx"].astype(np.int64)
            for k in ("train", "valid", "test")
            if f"{k}_idx" in data
        }


def _load_big_graph(path: str) -> Graph:
    data = np.load(path, allow_pickle=False)
    ei = data["edge_index"].astype(np.int32)
    n = int(data["num_nodes"]) if "num_nodes" in data else int(ei.max()) + 1
    return Graph(
        num_nodes=n,
        edge_index=ei,
        node_attr=data["node_attr"].astype(np.int32) if "node_attr" in data else None,
        edge_attr=data["edge_attr"].astype(np.int32) if "edge_attr" in data else None,
        y=data["y"] if "y" in data else None,
    )


class SplitDataset(GraphsMapDataset):
    """Map dataset carrying (train, valid, test) index splits."""

    def __init__(self, store: NpzGraphStore, permute: bool, seed: int):
        super().__init__(store, permute=permute, seed=seed)
        self._splits = store.splits

    def splits(self):
        n = len(self.store)
        if self._splits:
            return (
                self._splits.get("train", np.arange(n)),
                self._splits.get("valid", np.arange(0)),
                self._splits.get("test", np.arange(0)),
            )
        # random 80/10/10 fallback
        rng = np.random.default_rng(0)
        idx = rng.permutation(n)
        a, b = int(n * 0.8), int(n * 0.9)
        return idx[:a], idx[a:b], idx[b:]


def _graph_level_reader(name: str):
    @_readers(name)
    def _read(cfg, **kw):
        path = os.path.join(cfg.tokenization.data_dir, name, "graphs.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{name}: expected {path} (see graphgpt_tpu.readers npz contract)"
            )
        store = NpzGraphStore(path)
        return SplitDataset(store, permute=True, seed=cfg.training.seed)

    return _read


for _name in (
    "pcqm4m-v2",
    "ogbg-molhiv",
    "ogbg-molpcba",
    "ZINC",
    "CEPDB",
    "reddit_threads",
    "triangles",
):
    _graph_level_reader(_name)


@_readers("synthetic_mol")
def _read_synthetic(cfg, **kw):
    return SyntheticMolDataset(50_000, seed=cfg.training.seed)


@_readers("structure_er")
def _read_structure_er(cfg, size: int = 20000, **kw):
    """Attribute-free Erdős–Rényi structure dataset (reference
    StructureDataset, src/utils/dataset_utils.py:1425)."""

    class _ER:
        def __init__(self, n, seed):
            self.n, self.seed = n, seed

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            rng = np.random.default_rng((self.seed, i))
            g = erdos_renyi_graph(rng, int(rng.integers(8, 32)), float(rng.uniform(0.1, 0.4)))
            g.idx = i
            return g

    return _ER(size, cfg.training.seed)


def _edge_level_reader(name: str, default_depth_neighbors=((1, 14),), neg_ratio=1, percent=100):
    @_readers(name)
    def _read(cfg, data_split: str = "train", pretrain_mode: bool = False, **kw):
        path = os.path.join(cfg.tokenization.data_dir, name, "big_graph.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(f"{name}: expected {path}")
        data = np.load(path, allow_pickle=False)
        big = _load_big_graph(path)
        pos_key = f"{data_split}_edge"
        pos = data[pos_key].astype(np.int64) if pos_key in data else None
        neg_key = f"{data_split}_edge_neg"
        neg = data[neg_key].astype(np.int64) if neg_key in data else None
        return EgoEdgeDataset(
            big,
            depth_neighbors=default_depth_neighbors,
            pos_edges=pos,
            neg_edges=neg,
            neg_ratio=neg_ratio,
            percent=percent if data_split == "train" else 100,
            seed=cfg.training.seed,
            pretrain_mode=pretrain_mode,
        )

    return _read


# reference per-dataset sampling configs (configs/tokenization/edge_lvl/*)
_edge_level_reader("ogbl-ppa", ((1, 14),), neg_ratio=1, percent=50)
_edge_level_reader("ogbl-citation2", ((1, 14),), neg_ratio=1, percent=100)
_edge_level_reader("ogbl-ddi", ((1, 32),), neg_ratio=1, percent=100)
_edge_level_reader("ogbl-wikikg2", ((1, 8),), neg_ratio=1, percent=100)


def _node_level_reader(name: str, depth_neighbors=((2, 10),)):
    @_readers(name)
    def _read(cfg, data_split: str = "train", pretrain_mode: bool = False, **kw):
        path = os.path.join(cfg.tokenization.data_dir, name, "big_graph.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(f"{name}: expected {path}")
        data = np.load(path, allow_pickle=False)
        big = _load_big_graph(path)
        split_idx = (
            data[f"{data_split}_idx"].astype(np.int64)
            if f"{data_split}_idx" in data
            else None
        )
        node_ds = EgoNodeDataset(
            big,
            depth_neighbors=depth_neighbors,
            sample_idx=split_idx,
            seed=cfg.training.seed,
            pretrain_mode=pretrain_mode,
        )
        if pretrain_mode:
            # pretraining on big graphs ensembles node-ego with random-edge
            # subgraphs (reference EnsembleNodesEdgesMapDataset)
            rand_ds = RandomEdgesDataset(
                big, edges_per_sample=256, num_samples=len(node_ds) // 4 + 1,
                seed=cfg.training.seed,
            )
            return EnsembleDataset([node_ds, rand_ds])
        return node_ds

    return _read


for _name in ("ogbn-products", "ogbn-arxiv", "ogbn-proteins", "ogbn-papers100M"):
    _node_level_reader(_name)
