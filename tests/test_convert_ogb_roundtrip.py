"""tools/convert_ogb.py executed END TO END against faithful OGB API
stubs, round-tripped through graphgpt_tpu.readers.

The real `ogb` package can't run in this environment (zero egress), which
left the L0 offline converters "written but never executed" (r4 verdict).
These tests stub the four OGB dataset entry points with the exact API
surface the converters consume (torch tensors, get_idx_split /
get_edge_split dict shapes — mirrored from the reference readers,
src/data/_readers/*), run each converter for real, and then read the
emitted npz through the registered dataset readers, sampling graphs from
each. What remains untested is only the content of OGB's own downloads.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

from graphgpt_tpu.config import Config


class _G:
    """PyG-Data-alike for the graph-level converter."""

    def __init__(self, rng, with_pos=False):
        n = int(rng.integers(4, 9))
        e = int(rng.integers(3, 7))
        src = rng.integers(0, n, e)
        dst = (src + 1 + rng.integers(0, n - 1, e)) % n
        ei = np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)
        self.num_nodes = n
        self.edge_index = torch.as_tensor(ei, dtype=torch.long)
        self.x = torch.as_tensor(rng.integers(0, 10, (n, 9)), dtype=torch.long)
        self.edge_attr = torch.as_tensor(
            rng.integers(0, 4, (ei.shape[1], 3)), dtype=torch.long
        )
        self.y = torch.as_tensor([float(rng.normal(5.0, 1.0))])
        self.pos = (
            torch.as_tensor(rng.normal(size=(n, 3)), dtype=torch.float32)
            if with_pos
            else None
        )


def _mk_graph_ds(n_graphs=12, with_pos=True):
    rng = np.random.default_rng(0)
    graphs = [_G(rng, with_pos=with_pos) for _ in range(n_graphs)]

    class DS:
        def __iter__(self):
            return iter(graphs)

        def __len__(self):
            return len(graphs)

        def get_idx_split(self):
            idx = torch.arange(len(graphs))
            return {
                "train": idx[:8],
                "valid": idx[8:10],
                "test-dev": idx[10:],
            }

    return DS()


def _stub(monkeypatch, module: str, **attrs):
    mod = types.ModuleType(module)
    for k, v in attrs.items():
        setattr(mod, k, v)
    monkeypatch.setitem(sys.modules, module, mod)


def _cfg(tmp_path):
    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    return cfg


def test_graph_level_pcqm_roundtrip(tmp_path, monkeypatch):
    ds = _mk_graph_ds()
    _stub(monkeypatch, "ogb")
    _stub(monkeypatch, "ogb.lsc", PygPCQM4Mv2Dataset=lambda root: ds)
    from tools import convert_ogb

    convert_ogb.convert_graph_level("pcqm4m-v2", str(tmp_path))
    from graphgpt_tpu import readers

    out = readers.read_dataset("pcqm4m-v2", _cfg(tmp_path))
    assert len(out) > 0
    g = out[0]
    assert g.num_nodes >= 4 and g.node_attr.shape[1] == 9
    assert g.pos is not None and g.pos.shape == (g.num_nodes, 3)
    tr, va, te = out.splits()
    assert len(tr) == 8 and len(va) == 2 and len(te) == 2


def test_edge_level_ppa_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    n, e = 60, 240
    src = rng.integers(0, n, e)
    dst = (src + 1 + rng.integers(0, n - 1, e)) % n
    ei = np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)
    onehot = np.zeros((n, 5), np.float32)
    onehot[np.arange(n), rng.integers(0, 5, n)] = 1.0

    data = types.SimpleNamespace(
        edge_index=torch.as_tensor(ei, dtype=torch.long),
        num_nodes=n,
        x=torch.as_tensor(onehot),
    )
    pos = np.stack([src[:40], dst[:40]], axis=1)
    neg = rng.integers(0, n, (20, 2))
    split_edge = {
        "train": {"edge": torch.as_tensor(pos[:30], dtype=torch.long)},
        "valid": {
            "edge": torch.as_tensor(pos[30:35], dtype=torch.long),
            "edge_neg": torch.as_tensor(neg[:10], dtype=torch.long),
        },
        "test": {
            "edge": torch.as_tensor(pos[35:40], dtype=torch.long),
            "edge_neg": torch.as_tensor(neg[10:], dtype=torch.long),
        },
    }

    class DS:
        def __getitem__(self, i):
            return data

        def get_edge_split(self):
            return split_edge

    _stub(monkeypatch, "ogb")
    _stub(monkeypatch, "ogb.linkproppred", PygLinkPropPredDataset=lambda name, root: DS())
    from tools import convert_ogb

    convert_ogb.convert_edge_level("ogbl-ppa", str(tmp_path))
    from graphgpt_tpu import readers

    out = readers.read_dataset("ogbl-ppa", _cfg(tmp_path))
    assert len(out) > 0
    g = out[0]
    assert g.num_nodes >= 2
    # species encoding: [global id, local species id]
    npz = np.load(tmp_path / "ogbl-ppa" / "big_graph.npz")
    assert npz["node_attr"].shape == (n, 2)
    assert np.array_equal(npz["node_attr"][:, 0], np.arange(n))


def test_edge_level_citation2_structured_negs(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    n = 50
    src = rng.integers(0, n, 120)
    dst = (src + 1) % n
    ei = np.stack([src, dst])
    data = types.SimpleNamespace(
        edge_index=torch.as_tensor(ei, dtype=torch.long), num_nodes=n, x=None
    )
    vsrc = rng.integers(0, n, 6)
    vtgt = (vsrc + 2) % n
    vneg = rng.integers(0, n, (6, 4))
    split_edge = {
        "train": {
            "source_node": torch.as_tensor(src[:50], dtype=torch.long),
            "target_node": torch.as_tensor(dst[:50], dtype=torch.long),
        },
        "valid": {
            "source_node": torch.as_tensor(vsrc, dtype=torch.long),
            "target_node": torch.as_tensor(vtgt, dtype=torch.long),
            "target_node_neg": torch.as_tensor(vneg, dtype=torch.long),
        },
        "test": {
            "source_node": torch.as_tensor(vsrc, dtype=torch.long),
            "target_node": torch.as_tensor(vtgt, dtype=torch.long),
            "target_node_neg": torch.as_tensor(vneg, dtype=torch.long),
        },
    }

    class DS:
        def __getitem__(self, i):
            return data

        def get_edge_split(self):
            return split_edge

    _stub(monkeypatch, "ogb")
    _stub(monkeypatch, "ogb.linkproppred", PygLinkPropPredDataset=lambda name, root: DS())
    from tools import convert_ogb

    convert_ogb.convert_edge_level("ogbl-citation2", str(tmp_path))
    npz = np.load(tmp_path / "ogbl-citation2" / "big_graph.npz")
    # structured negatives [N, K, 2] pairing each positive's source with
    # its K candidate targets (reference ogb_utils.py:155-170 shape)
    assert npz["valid_edge_neg"].shape == (6, 4, 2)
    assert np.array_equal(npz["valid_edge_neg"][:, 0, 0], vsrc)
    from graphgpt_tpu import readers

    out = readers.read_dataset(
        "ogbl-citation2", _cfg(tmp_path), data_split="valid"
    )
    assert len(out) > 0 and out[0].num_nodes >= 2


def test_node_level_proteins_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    n = 80
    src = rng.integers(0, n, 300)
    dst = (src + 1 + rng.integers(0, n - 1, 300)) % n
    ei = np.stack([src, dst])
    species = rng.integers(3, 7, n)
    data = types.SimpleNamespace(
        edge_index=torch.as_tensor(ei, dtype=torch.long),
        num_nodes=n,
        x=None,
        y=torch.as_tensor(rng.integers(0, 2, (n, 4)), dtype=torch.float32),
        node_species=torch.as_tensor(species.reshape(-1, 1), dtype=torch.long),
        edge_attr=torch.as_tensor(
            rng.random((300, 8)).astype(np.float32)
        ),
    )
    idx = np.arange(n)

    class DS:
        def __getitem__(self, i):
            return data

        def get_idx_split(self):
            return {
                "train": torch.as_tensor(idx[:60]),
                "valid": torch.as_tensor(idx[60:70]),
                "test": torch.as_tensor(idx[70:]),
            }

    _stub(monkeypatch, "ogb")
    _stub(monkeypatch, "ogb.nodeproppred", PygNodePropPredDataset=lambda name, root: DS())
    from tools import convert_ogb

    convert_ogb.convert_node_level("ogbn-proteins", str(tmp_path))
    npz = np.load(tmp_path / "ogbn-proteins" / "big_graph.npz")
    # global/local species ids: local counts are 1-based per species
    attr = npz["node_attr"]
    assert np.array_equal(attr[:, 0], species)
    for s in np.unique(species):
        locs = np.sort(attr[attr[:, 0] == s, 1])
        assert np.array_equal(locs, np.arange(1, len(locs) + 1))
    # quantised edge attrs
    assert npz["edge_attr"].min() >= -1 and npz["edge_attr"].max() < 1000
    from graphgpt_tpu import readers

    out = readers.read_dataset("ogbn-proteins", _cfg(tmp_path))
    assert len(out) > 0 and out[0].num_nodes >= 1


def test_edge_level_wikikg2_triples(tmp_path, monkeypatch):
    rng = np.random.default_rng(4)
    n, r = 40, 6
    head = rng.integers(0, n, 30)
    tail = (head + 1) % n
    rel = rng.integers(0, r, 30)
    ei = np.stack([head, tail])
    data = types.SimpleNamespace(
        edge_index=torch.as_tensor(ei, dtype=torch.long), num_nodes=n, x=None
    )
    hneg = rng.integers(0, n, (30, 3))
    tneg = rng.integers(0, n, (30, 3))
    d = {
        "head": torch.as_tensor(head, dtype=torch.long),
        "tail": torch.as_tensor(tail, dtype=torch.long),
        "relation": torch.as_tensor(rel, dtype=torch.long),
    }
    dv = dict(d)
    dv["head_neg"] = torch.as_tensor(hneg, dtype=torch.long)
    dv["tail_neg"] = torch.as_tensor(tneg, dtype=torch.long)
    split_edge = {"train": d, "valid": dv, "test": dv}

    class DS:
        def __getitem__(self, i):
            return data

        def get_edge_split(self):
            return split_edge

    _stub(monkeypatch, "ogb")
    _stub(monkeypatch, "ogb.linkproppred", PygLinkPropPredDataset=lambda name, root: DS())
    from tools import convert_ogb

    convert_ogb.convert_edge_level("ogbl-wikikg2", str(tmp_path))
    npz = np.load(tmp_path / "ogbl-wikikg2" / "big_graph.npz")
    assert np.array_equal(npz["train_relation"], rel)
    # merged head-/tail-replacement negatives: [N, 2K, 2] (ogb_utils.py:
    # 105-128) — first K rows corrupt the head, last K the tail
    assert npz["valid_edge_neg"].shape == (30, 6, 2)
    assert np.array_equal(npz["valid_edge_neg"][:, :3, 1], np.stack([tail]*3, 1))
    assert np.array_equal(npz["valid_edge_neg"][:, 3:, 0], np.stack([head]*3, 1))
    from graphgpt_tpu import readers

    out = readers.read_dataset("ogbl-wikikg2", _cfg(tmp_path))
    assert len(out) > 0 and out[0].num_nodes >= 2
