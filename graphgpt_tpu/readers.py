"""Dataset registry & readers (reference L0/L1: src/data/data_sources.py,
_graph_factory.py, _readers/{pcqm4mv2,edge_level,node_level}.py).

This environment has no network egress, so readers consume a documented
on-disk **npz contract** instead of downloading OGB archives:

Graph-level (`<data_dir>/<name>/graphs.npz`):
    node_attr   [sum_N, Dn] int
    edge_attr   [sum_E, De] int
    edge_index  [2, sum_E] int (GLOBAL node ids: graph g's edges are
                offset by node_ptr[g]; get() subtracts the offset back)
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
        # OneID account->device pairs, graph-LOCAL node ids, sliced by
        # a2d_ptr; key_type [G] selects the reserved instruction token
        # (reference OneIDSmallDataset columns, dataset_utils.py:1303;
        # consumed by the a2d/a2d-stack instruction generators)
        self._a2d = data["a2d"].astype(np.int64) if "a2d" in data else None
        self._a2d_ptr = data["a2d_ptr"].astype(np.int64) if "a2d_ptr" in data else None
        self._key_type = (
            data["key_type"].astype(np.int64) if "key_type" in data else None
        )
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


# ---------------------------------------------------------------------------
# Split policies (reference _readers/pcqm4mv2.py:344-428)
# ---------------------------------------------------------------------------
def _special_molecule_idx(
    store: NpzGraphStore,
    *,
    edge0: bool = False,
    node1: bool = False,
    node2: bool = False,
    disconnected: bool = False,
) -> np.ndarray:
    """Indices of degenerate molecules (reference obtain_special_molecules,
    pcqm4mv2.py:405-428): zero edges / 1 node / 2 nodes / disconnected."""
    node_cnt = np.diff(store._node_ptr)
    edge_cnt = np.diff(store._edge_ptr)
    bad = np.zeros(len(node_cnt), bool)
    if edge0:
        bad |= edge_cnt == 0
    if node1:
        bad |= node_cnt == 1
    if node2:
        bad |= node_cnt == 2
    if disconnected:
        for g in np.flatnonzero(~bad):
            n = int(node_cnt[g])
            if n <= 1:
                continue
            s, e = store._edge_ptr[g], store._edge_ptr[g + 1]
            ei = store.edge_index[:, s:e] - store._node_ptr[g]
            parent = np.arange(n)

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in ei.T:
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[ra] = rb
            if len({find(i) for i in range(n)}) > 1:
                bad[g] = True
    return np.flatnonzero(bad)


def apply_split_policies(store: NpzGraphStore, splits, policy: dict):
    """Apply the reference's PCQM4M-v2 split manipulations to
    (train, valid, test) index arrays:

      - remove_special: drop degenerate molecules from every split
        (remove_special_molecules, pcqm4mv2.py:391-403)
      - true_valid: mix valid into train keeping `num_remained` (5000) as
        the new valid; seen valid samples double as test
        (add_valid_to_train, pcqm4mv2.py:344-368)
      - test_large: molecules with > 18 nodes from valid become test
        (get_large_mols_as_test_from_valid, pcqm4mv2.py:371-379)
      - duplicate_train: repeat train indices `rate` times
        (duplicate_sample_idx, pcqm4mv2.py:382-388)
    """
    train, valid, test = (np.asarray(s, np.int64) for s in splits)
    if not policy:
        return train, valid, test
    if policy.get("remove_special"):
        spec = policy["remove_special"]
        spec = spec if isinstance(spec, dict) else {"edge0": True, "node1": True}
        removed = set(_special_molecule_idx(store, **spec).tolist())
        keep = lambda idx: np.asarray(
            sorted(set(idx.tolist()) - removed), np.int64
        )
        train, valid, test = keep(train), keep(valid), keep(test)
    if policy.get("true_valid"):
        num_remained = int(policy.get("num_remained", 5000))
        rng = np.random.default_rng(42)
        perm = rng.permutation(len(valid))
        into_train = perm[:-num_remained]
        new_valid = valid[perm[-num_remained:]]
        cnt_test = min(num_remained, len(valid) - num_remained)
        test = valid[perm[:cnt_test]]
        train = np.concatenate([train, valid[into_train]])
        valid = new_valid
    if policy.get("test_large"):
        threshold = int(policy.get("large_threshold", 18))
        node_cnt = np.diff(store._node_ptr)
        test = valid[node_cnt[valid] > threshold]
    if policy.get("duplicate_train"):
        train = np.tile(train, int(policy["duplicate_train"]))
    return train, valid, test


# auxiliary pretrain corpora ensembled into PCQM training and the y column
# each keeps: CEPDB e_gap_alpha (y[:, 5]), ZINC Desolv_apolar (y[:, 2])
# (reference add_cepdb/add_zinc, _readers/pcqm4mv2.py:120-157)
_AUX_Y_COL = {"CEPDB": 5, "ZINC": 2}


class EnsembleSplitDataset(EnsembleDataset):
    """Base split dataset + auxiliary corpora appended to the TRAIN split
    only (reference EnsembleGraphsMapDataset wrapping,
    _readers/pcqm4mv2.py:120-157: valid/test stay on the base dataset)."""

    def __init__(self, base: "SplitDataset", auxes):
        super().__init__([base] + list(auxes))
        self.base = base

    def splits(self):
        tr, va, te = self.base.splits()
        extra = [
            np.arange(self._ptr[k], self._ptr[k + 1], dtype=np.int64)
            for k in range(1, len(self.datasets))
        ]
        if extra:
            tr = np.concatenate([tr] + extra)
        return tr, va, te


def _load_aux_dataset(cfg, name: str):
    path = os.path.join(cfg.tokenization.data_dir, name, "graphs.npz")
    store = NpzGraphStore(path)
    if store._ys is not None and store._ys.ndim == 2:
        col = _AUX_Y_COL.get(name, 0)
        store._ys = np.nan_to_num(store._ys[:, col : col + 1], nan=0.0)
    return GraphsMapDataset(store, permute=True, seed=cfg.training.seed)


def _graph_level_reader(name: str):
    @_readers(name)
    def _read(cfg, **kw):
        path = os.path.join(cfg.tokenization.data_dir, name, "graphs.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{name}: expected {path} (see graphgpt_tpu.readers npz contract)"
            )
        store = NpzGraphStore(path)
        ds = SplitDataset(store, permute=True, seed=cfg.training.seed)
        policy = dict(getattr(cfg.tokenization, "dataset_policy", {}) or {})
        if policy:
            base = ds.splits()
            tr, va, te = apply_split_policies(store, base, policy)
            ds._splits = {"train": tr, "valid": va, "test": te}
        if policy.get("pos_percentile_bounds") and store._pos is not None:
            from .data.mol3d import build_dict_bounds

            ds.dict_bounds = build_dict_bounds(
                store._pos, cache_dir=os.path.dirname(path)
            )
        auxes = [
            _load_aux_dataset(cfg, aux)
            for aux in ("CEPDB", "ZINC")
            if policy.get(f"add_{aux.lower()}")
        ]
        if auxes:
            ens = EnsembleSplitDataset(ds, auxes)
            ens.dict_bounds = getattr(ds, "dict_bounds", None)
            return ens
        return ds

    return _read


for _name in (
    "pcqm4m-v2",
    "ogbg-molhiv",
    "ogbg-molpcba",
    "ZINC",
    "CEPDB",
    "reddit_threads",
    "triangles",
    # custom graph-level corpora (reference SpiceCircuitDataset,
    # OneIDSmallDataset, PygCustomMolDataset — dataset_utils.py:723,1303,1640);
    # their rdkit/netlist preprocessing happens offline into the npz contract
    # (tools/convert_ogb.py, tools/spice2graph.py)
    "spice-circuit",
    "oneid",
    "custom_mol",
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


def _edge_level_reader(
    name: str,
    default_depth_neighbors=((1, 14),),
    neg_ratio=1,
    percent=100,
    relations: bool = False,
    sample_wgt: bool = False,
    method: str = "global",
):
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
        pos_attr = neg_cands = None
        if relations and f"{data_split}_relation" in data:
            # wikikg2 relation -> target edge attrs [ones, rel] and the
            # unique-relation candidate table (reference edge_level.py:241-262)
            rel = data[f"{data_split}_relation"].astype(np.int64)
            pos_attr = np.stack([np.ones_like(rel), rel], axis=1)
            uniq = np.unique(rel)
            neg_cands = np.stack([np.ones_like(uniq), uniq], axis=1)
        return EgoEdgeDataset(
            big,
            depth_neighbors=default_depth_neighbors,
            pos_edges=pos,
            neg_edges=neg,
            neg_ratio=neg_ratio,
            percent=percent if data_split == "train" else 100,
            method=method,
            seed=cfg.training.seed,
            pretrain_mode=pretrain_mode,
            pos_edge_attr=pos_attr,
            neg_edge_attr_candidates=neg_cands,
            sample_wgt=sample_wgt and data_split == "train",
        )

    return _read


# reference per-dataset sampling configs (configs/tokenization/edge_lvl/*)
_edge_level_reader("ogbl-ppa", ((1, 14),), neg_ratio=1, percent=50)
_edge_level_reader("ogbl-citation2", ((1, 14),), neg_ratio=1, percent=100)
_edge_level_reader("ogbl-ddi", ((1, 32),), neg_ratio=1, percent=100)
# wikikg2: relation edge-attrs + inverse-freq sample weights + local
# head/tail-corruption negatives (reference edge_level.py:210-300,
# dataset_map.py:369-388)
_edge_level_reader(
    "ogbl-wikikg2", ((1, 8),), neg_ratio=1, percent=100,
    relations=True, sample_wgt=True, method="local",
)


def _make_species_mask_func(name: str):
    """ogbn-proteins species-masking closure (reference _mask_species,
    node_level.py:302-309): zero every node-attr column beyond the two
    global/local id columns for nodes sharing the TARGET node's species,
    preventing label leakage through label-as-feature columns."""

    def _mask_species(g):
        species = g.extra.get("node_species")
        if species is None or g.node_attr is None or g.node_attr.shape[1] <= 2:
            return g
        root = int(np.asarray(g.root_n_id).reshape(-1)[0])
        tgt = species.reshape(-1)[root]
        keep = (species.reshape(-1) != tgt).astype(g.node_attr.dtype)  # [N]
        mask = np.repeat(keep[:, None], g.node_attr.shape[1], axis=1)
        mask[:, :2] = 1
        g.node_attr = g.node_attr * mask
        return g

    return _mask_species


def _node_level_reader(name: str, depth_neighbors=((2, 10),), species_mask=False):
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
        task_mask_func = None
        if species_mask and "node_species" in data:
            big.extra["node_species"] = data["node_species"].astype(np.int64)
            task_mask_func = _make_species_mask_func(name)
        # root x_mask: multiply the seed node's attrs during fine-tuning to
        # hide label-as-feature columns (reference dataset_map.py:253-258,
        # x_mask from _mask_concat_node_label_as_feat)
        root_attr_mask = data["x_mask"].astype(np.int64) if "x_mask" in data else None
        node_ds = EgoNodeDataset(
            big,
            depth_neighbors=depth_neighbors,
            sample_idx=split_idx,
            seed=cfg.training.seed,
            pretrain_mode=pretrain_mode,
            task_mask_func=task_mask_func,
            root_attr_mask=root_attr_mask,
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


for _name in ("ogbn-products", "ogbn-arxiv", "ogbn-papers100M"):
    _node_level_reader(_name)
_node_level_reader("ogbn-proteins", species_mask=True)
