"""Streaming shards, weight conversion round-trip."""

import jax
import numpy as np

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.data.datasets import SyntheticMolDataset
from graphgpt_tpu.data.streaming import (
    ErdosRenyiStream,
    ShardedNpzStream,
    write_npz_shards,
)
from graphgpt_tpu.models import heads
from graphgpt_tpu.utils import convert


def test_npz_shard_roundtrip(tmp_path):
    ds = SyntheticMolDataset(50, seed=0)
    n = write_npz_shards((ds[i] for i in range(50)), str(tmp_path), shard_size=16)
    assert n == 50
    stream = ShardedNpzStream(str(tmp_path), shuffle_shards=False)
    graphs = list(stream.iter_epoch(0))
    assert len(graphs) == 50
    # content preserved for EVERY graph — incl. edge indices of graphs past
    # the first, which the pre-round-4 writer stored without the global
    # node_ptr offset the reader subtracts (silent corruption)
    for i in (0, 1, 17, 49):
        g0, g1 = ds[i], graphs[i]
        assert g1.num_nodes == g0.num_nodes
        np.testing.assert_array_equal(g1.node_attr, g0.node_attr)
        np.testing.assert_array_equal(g1.edge_index, g0.edge_index)
        assert g1.edge_index.min() >= 0


def test_stream_resume_skip(tmp_path):
    ds = SyntheticMolDataset(40, seed=1)
    write_npz_shards((ds[i] for i in range(40)), str(tmp_path), shard_size=10)
    stream = ShardedNpzStream(str(tmp_path), shuffle_shards=False)
    full = list(stream.iter_epoch(0))
    resumed = list(stream.iter_epoch(0, skip_samples=15))
    assert len(resumed) == 25
    assert resumed[0].num_nodes == full[15].num_nodes


def test_stream_rank_slicing(tmp_path):
    ds = SyntheticMolDataset(40, seed=2)
    write_npz_shards((ds[i] for i in range(40)), str(tmp_path), shard_size=10)
    a = list(ShardedNpzStream(str(tmp_path), rank=0, world=2, shuffle_shards=False))
    b = list(ShardedNpzStream(str(tmp_path), rank=1, world=2, shuffle_shards=False))
    assert len(a) + len(b) == 40


def test_erdos_renyi_stream():
    it = iter(ErdosRenyiStream(seed=0))
    g1, g2 = next(it), next(it)
    assert g1.num_nodes >= 8
    # deterministic per index
    g1b = next(iter(ErdosRenyiStream(seed=0)))
    assert g1b.num_nodes == g1.num_nodes


def test_weight_conversion_roundtrip():
    cfg = ModelConfig(
        vocab_size=60,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=3,
        next_n_token=3,
        stacked_feat_agg_method="gated",
        dtype="float32",
    ).finalize()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    sd = convert.params_to_flat_state_dict(params, cfg.num_hidden_layers)
    assert "model.layers.1.self_attn.q_proj.weight" in sd
    assert sd["model.layers.0.mlp.gate_proj.weight"].shape == (64, 32)
    # round-trip into a fresh template
    template = heads.init_pretrain_params(cfg, jax.random.PRNGKey(1))
    back = convert.flat_state_dict_to_params(sd, template)
    np.testing.assert_allclose(
        np.asarray(back["layers"]["q"]), np.asarray(params["layers"]["q"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back["lm_head"]), np.asarray(params["lm_head"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back["stacked_agg_w"]), np.asarray(params["stacked_agg_w"]), rtol=1e-6
    )


def test_featurize_mol_collate_roundtrip(tmp_path):
    """tools/featurize_mol.py npz assembly (rdkit-free layer): collated
    output is loadable by NpzGraphStore with identical per-graph slices;
    failed conversions (None) are skipped with their labels."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from featurize_mol import collate_graphs

    from graphgpt_tpu.readers import NpzGraphStore

    rng = np.random.default_rng(0)
    graphs, ys = [], []
    for k in range(5):
        if k == 2:
            graphs.append(None)  # failed conversion is skipped
            ys.append(99.0)
            continue
        n = int(rng.integers(2, 6))
        src = np.arange(n - 1)
        ei = np.stack([np.concatenate([src, src + 1]), np.concatenate([src + 1, src])])
        graphs.append(
            {
                "node_attr": rng.integers(0, 9, size=(n, 9)),
                "edge_index": ei,
                "edge_attr": rng.integers(0, 3, size=(ei.shape[1], 3)),
                "pos": rng.normal(size=(n, 3)).astype(np.float32),
            }
        )
        ys.append(float(k))
    out = collate_graphs(graphs, ys)
    path = tmp_path / "graphs.npz"
    np.savez(path, **out)
    store = NpzGraphStore(str(path))
    assert len(store) == 4
    assert [float(y) for y in store._ys.reshape(-1)] == [0.0, 1.0, 3.0, 4.0]
    g1 = store.get(1)
    np.testing.assert_array_equal(g1.node_attr, graphs[1]["node_attr"])
    np.testing.assert_array_equal(g1.edge_index, graphs[1]["edge_index"])
    np.testing.assert_array_equal(g1.pos, graphs[1]["pos"])


def test_ani1_hdf5_pairs(tmp_path):
    """ANI-1 HDF5 ingestion (reference pyanitools layout: groups of entries
    holding `smiles` as a char array + `energies` per conformation;
    PygANI1Dataset takes the FIRST conformer energy,
    dataset_utils.py:1003-1008). h5py is available in this image, so the
    reader is exercised on a real file."""
    import sys

    h5py = __import__("h5py")
    sys.path.insert(0, "tools")
    from featurize_mol import _ani1_pairs

    path = tmp_path / "ani_gdb_s01.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("gdb11_s01")
        e1 = g.create_group("mol1")
        e1.create_dataset("smiles", data=[c.encode() for c in "CCO"])
        e1.create_dataset("energies", data=np.asarray([-1.5, -1.4, -1.3]))
        e1.create_dataset(
            "coordinates", data=np.zeros((3, 9, 3), np.float32)
        )
        e2 = g.create_group("mol2")
        e2.create_dataset("smiles", data=[c.encode() for c in "C#N"])
        e2.create_dataset("energies", data=np.asarray([-2.25]))

    pairs = sorted(_ani1_pairs(str(tmp_path / "*.h5")))
    assert pairs == [("C#N", -2.25), ("CCO", -1.5)]
