"""Pallas flash attention vs the XLA reference, in interpreter mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.ops import flash_attention as fa
from graphgpt_tpu.ops.attention import xla_attention


def _rand_qkv(b, p, h, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, p, h, d)) * 0.5, dtype)
    return mk(), mk(), mk()


def _run_flash(q, k, v, seg, causal):
    """Run the pallas kernel in interpreter mode (CPU-safe)."""
    with jax.disable_jit():  # interpret path triggers automatically off-TPU?
        pass
    # patch pallas_call to interpret=True via force mode
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(q, k, v, seg, causal=causal)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla_full_batch(causal):
    b, p, h, d = 2, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d)
    seg = jnp.ones((b, p), jnp.int32)
    got = _run_flash(q, k, v, seg, causal)
    want = xla_attention(q, k, v, seg, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_segments_and_padding(causal):
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=1)
    seg = np.ones((b, p), np.int32)
    seg[:, 40:90] = 2
    seg[:, 90:] = 0  # padding tail
    seg = jnp.asarray(seg)
    got = _run_flash(q, k, v, seg, causal)
    want = xla_attention(q, k, v, seg, causal)
    np.testing.assert_allclose(
        np.asarray(got[:, :90]), np.asarray(want[:, :90]), rtol=2e-4, atol=2e-4
    )


def test_flash_gradients_match_xla():
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=2)
    seg = np.ones((b, p), np.int32)
    seg[:, 100:] = 0
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, seg, causal=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, seg, causal=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


def test_flash_gqa():
    b, p, h, d = 1, 128, 4, 32
    q, _, _ = _rand_qkv(b, p, h, d, seed=3)
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.normal(size=(b, p, 2, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, p, 2, d)) * 0.5, jnp.float32)
    seg = jnp.ones((b, p), jnp.int32)
    got = _run_flash(q, k, v, seg, False)
    want = xla_attention(q, k, v, seg, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_streaming_path_matches_xla(causal, monkeypatch):
    """Force the online-softmax (multi-tile) kernels, fwd and bwd."""
    monkeypatch.setattr(fa, "_MAX_SINGLE_BLOCK", 32)
    monkeypatch.setattr(fa, "_pick_block", lambda p, target=32: min(p, 32))
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=6)
    seg = np.ones((b, p), np.int32)
    seg[:, 50:90] = 2
    seg[:, 90:] = 0
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out1 = fa.flash_attention(q, k, v, seg, causal=causal)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    out2 = xla_attention(q, k, v, seg, causal=causal)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


def test_flash_gradients_match_xla_causal():
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=5)
    seg = jnp.ones((b, p), jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, seg, causal=True).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, causal=True).astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Band kernels (segment-block skipping for packed rows)
# ---------------------------------------------------------------------------
def _packed_seg(p, mean_len=17, seed=0):
    """Realistic packed row: many short segments + a padding tail."""
    rng = np.random.default_rng(seed)
    seg = np.zeros(p, np.int32)
    pos, sid = 0, 1
    while pos < p - 4:
        ln = int(rng.integers(mean_len // 2, mean_len * 2))
        ln = min(ln, p - 4 - pos)
        if ln <= 0:
            break
        seg[pos : pos + ln] = sid
        pos += ln
        sid += 1
    return seg  # last few positions stay 0 (padding)


@pytest.mark.parametrize("mode", ["skip", "band"])
@pytest.mark.parametrize("causal", [False, True])
def test_band_many_segments_matches_xla(causal, mode, monkeypatch):
    """The flagship workload shape: many short packed segments."""
    monkeypatch.setattr(fa, "_MODE", mode)
    b, p, h, d = 2, 256, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=7)
    seg = jnp.asarray(np.stack([_packed_seg(p, seed=s) for s in range(b)]))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out1 = fa.flash_attention(q, k, v, seg, causal=causal)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    out2 = xla_attention(q, k, v, seg, causal=causal)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("mode", ["skip", "band", "legacy"])
def test_band_bi_causal_matches_xla(mode, monkeypatch):
    """bi_causal_split in-kernel (VERDICT r3 item 7): rows before
    split=P-bi attend the bidirectional prefix; rows at/after attend
    causally to everything (reference attn_mask_utils.py:128-155)."""
    monkeypatch.setattr(fa, "_MODE", mode)
    b, p, h, d = 1, 256, 2, 32
    bi = 64
    q, k, v = _rand_qkv(b, p, h, d, seed=8)
    seg = np.ones((b, p), np.int32)
    seg[:, 240:] = 0
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, seg, causal=False, bi_causal_split=bi)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, seg, causal=False, bi_causal_split=bi)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out1 = fa.flash_attention(q, k, v, seg, causal=False, bi_causal_split=bi)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    out2 = xla_attention(q, k, v, seg, causal=False, bi_causal_split=bi)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_legacy_dense_path_still_matches(causal, monkeypatch):
    """GGT_FLASH_MODE=legacy restores the round-3 dense-tile kernels."""
    monkeypatch.setattr(fa, "_MODE", "legacy")
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=9)
    seg = np.ones((b, p), np.int32)
    seg[:, 50:90] = 2
    seg[:, 90:] = 0
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, causal=causal).astype(jnp.float32) ** 2)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out1 = fa.flash_attention(q, k, v, seg, causal=causal)
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    out2 = xla_attention(q, k, v, seg, causal=causal)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# In-kernel RoPE (round 5): rotation folded into the kernels, fwd + bwd
# ---------------------------------------------------------------------------
def _rope_tables(b, p, dh, seed=3):
    from graphgpt_tpu.models.rope import rope_cos_sin

    pos = jnp.tile(jnp.arange(p, dtype=jnp.int32), (b, 1))
    return rope_cos_sin(pos, dh, 10000.0)


def _seg_padded(b, p):
    seg = np.ones((b, p), np.int32)
    seg[:, 40:90] = 2
    seg[:, p - 20 :] = 0
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal", [False, True])
def test_rope_in_kernel_matches_prerotated(monkeypatch, causal):
    """flash(rope=(cos,sin)) on RAW q/k == pre-rotated q/k through the
    same kernel AND the XLA oracle — dh=64 (the flagship head_dim; no
    pad-lane pairing)."""
    from graphgpt_tpu.models.rope import apply_rope

    monkeypatch.setenv("GGT_PALLAS_INTERPRET", "1")
    b, p, h, d = 2, 128, 2, 64
    q, k, v = _rand_qkv(b, p, h, d, seed=5)
    seg = _seg_padded(b, p)
    cos, sin = _rope_tables(b, p, d)
    got = fa.flash_attention(q, k, v, seg, causal=causal, rope=(cos, sin))
    qr, kr = apply_rope(q, k, cos, sin)
    want_kernel = fa.flash_attention(qr, kr, v, seg, causal=causal)
    want_xla = xla_attention(qr, kr, v, seg, causal)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_kernel), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_xla), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("stream", [False, True])
def test_rope_in_kernel_gradients(monkeypatch, stream):
    """Gradients through the in-kernel rotation (transpose rotation on
    dq/dk) == autodiff of apply_rope + XLA attention; stream=True forces
    the multi-block dq/dkv kernels (counter-rotation at the accumulator
    finish)."""
    from graphgpt_tpu.models.rope import apply_rope

    monkeypatch.setenv("GGT_PALLAS_INTERPRET", "1")
    if stream:
        monkeypatch.setattr(fa, "_MAX_SINGLE_BLOCK", 64)
        monkeypatch.setattr(fa, "_BQ_TARGET", 64)
    b, p, h, d = 1, 128, 2, 64
    q, k, v = _rand_qkv(b, p, h, d, seed=6)
    seg = _seg_padded(b, p)
    cos, sin = _rope_tables(b, p, d)

    def loss_kernel(q, k, v):
        out = fa.flash_attention(q, k, v, seg, rope=(cos, sin))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        qr, kr = apply_rope(q, k, cos, sin)
        return jnp.sum(xla_attention(qr, kr, v, seg).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3
        )


def test_rope_small_dh_prerotates(monkeypatch):
    """dh < the pad width pre-rotates outside (rotate_half pairing would
    mix real and pad lanes in-kernel) — results must still match."""
    from graphgpt_tpu.models.rope import apply_rope

    monkeypatch.setenv("GGT_PALLAS_INTERPRET", "1")
    b, p, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b, p, h, d, seed=7)
    seg = jnp.ones((b, p), jnp.int32)
    cos, sin = _rope_tables(b, p, d)
    got = fa.flash_attention(q, k, v, seg, rope=(cos, sin))
    qr, kr = apply_rope(q, k, cos, sin)
    want = xla_attention(qr, kr, v, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
