"""Denoising double-heads model + bi-causal attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.models import denoise
from graphgpt_tpu.ops.attention import xla_attention


def _cfg(**kw):
    cfg = ModelConfig(
        vocab_size=80,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=4,
        next_n_token=1,
        mask_token_id=1,
        dtype="float32",
        task_type="graph",
        problem_type="regression",
        loss_type="l1",
        num_labels=1,
        pos_num_bins=16,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg.finalize()


def _batch(cfg, b=2, p=20):
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(b, p, cfg.stacked_feat)).astype(np.int32)
    node_idx = np.tile(np.arange(p), (b, 1)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.tile(jnp.arange(p), (b, 1)),
        "segment_ids": jnp.ones((b, p), jnp.int32),
        "pos_type": jnp.asarray(np.clip(node_idx + 1, 0, 4)),
        "node_idx": jnp.asarray(node_idx + 1),
        "pos": jnp.asarray(rng.normal(size=(b, p, 3)).astype(np.float32)),
        "graph_labels": jnp.asarray(rng.normal(5, 1, size=(b, 1)).astype(np.float32)),
    }


def test_denoise_forward_and_grads():
    cfg = _cfg()
    params = denoise.init_denoise_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    fn = jax.jit(lambda p, b, r: denoise.denoise_forward(p, cfg, b, rng=r, train=True))
    out = fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["task_loss"]))
    assert np.isfinite(float(out["pretrain_loss"]))  # denoise loss
    g = jax.jit(
        jax.grad(lambda p: denoise.denoise_forward(p, cfg, batch, rng=jax.random.PRNGKey(1), train=True)["loss"])
    )(params)
    assert float(jnp.abs(g["denoise"]["force_w"]).sum()) > 0
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_denoise_bicausal_energy():
    cfg = _cfg(bi_causal_split=16)
    params = denoise.init_denoise_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg, p=40)
    out = jax.jit(lambda p, b: denoise.denoise_forward(p, cfg, b, rng=jax.random.PRNGKey(0), train=True))(params, batch)
    assert np.isfinite(float(out["task_loss"]))
    assert out["task_logits"].shape == (2, 1)


def test_bi_causal_mask_structure():
    """Bidirectional prefix cannot see the causal suffix; suffix is causal."""
    rng = np.random.default_rng(0)
    b, p, h, d = 1, 12, 2, 8
    q = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    seg = jnp.ones((b, p), jnp.int32)
    split = 4  # suffix of length 4
    out1 = xla_attention(q, k, v, seg, bi_causal_split=split)
    # changing the last suffix position must not affect prefix outputs
    v2 = v.at[:, -1].set(v[:, -1] + 10)
    out2 = xla_attention(q, k, v2, seg, bi_causal_split=split)
    np.testing.assert_allclose(
        np.asarray(out1[:, : p - split]), np.asarray(out2[:, : p - split]), rtol=1e-5
    )
    # suffix rows see everything before them (changing prefix changes suffix)
    v3 = v.at[:, 0].set(v[:, 0] + 10)
    out3 = xla_attention(q, k, v3, seg, bi_causal_split=split)
    assert not np.allclose(np.asarray(out1[:, -1]), np.asarray(out3[:, -1]))


def test_atom_task_head_equivariance_direction():
    """Force output lives in the displacement span: translating all
    positions leaves delta_pos (and forces) unchanged."""
    cfg = _cfg()
    params = denoise.init_denoise_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, p = 1, 8
    hidden = jnp.asarray(rng.normal(size=(b, p, cfg.hidden_size)), jnp.float32)
    pos = rng.normal(size=(b, p, 3)).astype(np.float32)
    posj = jnp.asarray(pos)
    def dp(x):
        d = x[:, :, None, :] - x[:, None, :, :]
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1.0)
    pids = jnp.tile(jnp.arange(p), (b, 1))
    f1 = denoise.atom_task_head(params["denoise"], hidden, pids, dp(posj), cfg)
    f2 = denoise.atom_task_head(params["denoise"], hidden, pids, dp(posj + 5.0), cfg)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5)


def test_mixed_bi_causal_additive_mask():
    from graphgpt_tpu.ops.attention import mixed_bi_causal_additive_mask

    seg = jnp.ones((1, 8), jnp.int32)
    bi = jnp.asarray([[0, 0, 0, 0, 0, 1, 1, 1]], jnp.int32)  # bi suffix len 3
    m = np.asarray(mixed_bi_causal_additive_mask(seg, bi))[0, 0]
    ok = m == 0
    # causal prefix rows attend causally
    assert ok[2, 0] and ok[2, 2] and not ok[2, 3]
    # bi region rows attend each other both ways
    assert ok[5, 7] and ok[7, 5]
    # boundary (position 4 = last causal token) hidden from later rows
    assert not ok[5, 4] and not ok[6, 4] and not ok[7, 4]
    # but visible to itself/before
    assert ok[4, 4]


def test_denoise_smtp3d_aux_and_schedule():
    """smtp_3d: node-level schedule masking zeroes the masked noise/pos,
    their pos tokens become [mask], and the aux CE over the clean-line
    labels joins the loss scaled by smtp_wgt
    (modeling_finetune.py:742-881)."""
    cfg = _cfg()
    cfg.smtp_3d = True
    cfg.smtp_vocab = 32
    cfg.smtp_wgt = 0.5
    cfg.smtp_3d_power = 1.0
    cfg.finalize()
    params = denoise.init_denoise_params(cfg, jax.random.PRNGKey(0))
    assert "smtp_proj" in params and "smtp_head" in params
    batch = _batch(cfg)
    out = denoise.denoise_forward(params, cfg, batch, jax.random.PRNGKey(1))
    assert "smtp_loss" in out
    assert np.isfinite(float(out["smtp_loss"]))
    total = float(out["task_loss"]) + float(out["pretrain_loss"]) + float(out["smtp_loss"])
    np.testing.assert_allclose(float(out["loss"]), total, rtol=1e-5)

    # halving smtp_wgt halves the aux term
    cfg2 = _cfg()
    cfg2.smtp_3d = True
    cfg2.smtp_vocab = 32
    cfg2.smtp_wgt = 0.25
    cfg2.smtp_3d_power = 1.0
    cfg2.finalize()
    out2 = denoise.denoise_forward(params, cfg2, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(out2["smtp_loss"]), float(out["smtp_loss"]) / 2, rtol=1e-5
    )

    # denoise_schedule_pow: schedule masking without the aux head
    cfg3 = _cfg()
    cfg3.denoise_schedule_pow = 1.0
    cfg3.finalize()
    params3 = denoise.init_denoise_params(cfg3, jax.random.PRNGKey(0))
    out3 = denoise.denoise_forward(params3, cfg3, batch, jax.random.PRNGKey(1))
    assert "smtp_loss" not in out3
    assert np.isfinite(float(out3["loss"]))
