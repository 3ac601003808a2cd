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
    # content preserved (first graph of first shard)
    g0 = ds[0]
    g1 = graphs[0]
    assert g1.num_nodes == g0.num_nodes
    np.testing.assert_array_equal(g1.node_attr, g0.node_attr)


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
