"""Rotary position embeddings (HF-Llama rotate_half convention).

Matches the reference backbone's RoPE semantics (theta 1e4, head-dim pairs,
transformers LlamaRotaryEmbedding) so that converted reference checkpoints
reproduce activations. Also implements the reference's `rope_range`
position rescaling (src/models/graphgpt/utils_graphgpt.py:574-581),
Resonance RoPE integer-wavelength rounding (utils_graphgpt.py:381-462),
and the HF `rope_scaling` passthrough (linear / dynamic-NTK / yarn /
llama3) the reference forwards into transformers
(configuration_graphgpt.py:321-334) — formulas match
transformers.modeling_rope_utils (tested for parity in
tests/test_model.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def scaled_inv_freq(
    head_dim: int,
    theta: float,
    rope_scaling: Optional[dict],
    max_position_embeddings: int,
) -> Tuple[np.ndarray, float]:
    """(inv_freq [Dh/2], attention_factor) per HF modeling_rope_utils.

    Computed in NumPy at trace time (all inputs are static)."""
    exponent = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    inv_freq = 1.0 / (theta**exponent)
    if not rope_scaling:
        return inv_freq, 1.0
    rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
    factor = float(rope_scaling.get("factor", 1.0))
    if rope_type == "default":
        return inv_freq, 1.0
    if rope_type == "linear":
        return inv_freq / factor, 1.0
    if rope_type == "dynamic":
        # NTK-aware base rescaling (HF _compute_dynamic_ntk_parameters):
        # seq_len defaults to max_position_embeddings, where the multiplier
        # collapses to 1; pass "seq_len" in rope_scaling to stretch.
        seq_len = max(
            int(rope_scaling.get("seq_len") or 0), max_position_embeddings
        )
        base = theta * (
            (factor * seq_len / max_position_embeddings) - (factor - 1)
        ) ** (head_dim / (head_dim - 2))
        return 1.0 / (base**exponent), 1.0
    if rope_type == "yarn":
        orig = int(
            rope_scaling.get(
                "original_max_position_embeddings", max_position_embeddings
            )
        )
        beta_fast = float(rope_scaling.get("beta_fast") or 32.0)
        beta_slow = float(rope_scaling.get("beta_slow") or 1.0)
        attention_factor = rope_scaling.get("attention_factor")
        if attention_factor is None:
            mscale = rope_scaling.get("mscale")
            attention_factor = (
                0.1 * math.log(factor) + 1.0
                if mscale is None
                else float(mscale)
            )

        def find_correction_dim(num_rotations):
            return (
                head_dim
                * math.log(orig / (num_rotations * 2 * math.pi))
            ) / (2 * math.log(theta))

        low = max(math.floor(find_correction_dim(beta_fast)), 0)
        high = min(math.ceil(find_correction_dim(beta_slow)), head_dim - 1)
        # linear ramp 0->1 across [low, high] over the Dh/2 frequencies
        denom = max(high - low, 1e-3)
        ramp = np.clip((np.arange(head_dim // 2, dtype=np.float64) - low) / denom, 0, 1)
        inv_freq_extrapolation_factor = 1.0 - ramp
        inv_freq_interpolation = inv_freq / factor
        out = (
            inv_freq_interpolation * (1 - inv_freq_extrapolation_factor)
            + inv_freq * inv_freq_extrapolation_factor
        )
        return out, float(attention_factor)
    if rope_type == "llama3":
        orig = int(
            rope_scaling.get(
                "original_max_position_embeddings", max_position_embeddings
            )
        )
        low_ff = float(rope_scaling.get("low_freq_factor", 1.0))
        high_ff = float(rope_scaling.get("high_freq_factor", 4.0))
        low_freq_wavelen = orig / low_ff
        high_freq_wavelen = orig / high_ff
        wavelen = 2 * math.pi / inv_freq
        out = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
        smooth = (orig / wavelen - low_ff) / (high_ff - low_ff)
        smoothed = (1 - smooth) * out / factor + smooth * out
        is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
        return np.where(is_medium, smoothed, out), 1.0
    raise ValueError(f"unsupported rope_scaling type {rope_type!r}")


def rope_cos_sin(
    position_ids: jnp.ndarray,  # [B, P] int
    head_dim: int,
    theta: float = 10000.0,
    resonance: bool = False,
    dtype=jnp.float32,
    rope_scaling: Optional[dict] = None,
    max_position_embeddings: int = 1024,
):
    """Returns (cos, sin) of shape [B, P, head_dim]."""
    inv_freq_np, attention_factor = scaled_inv_freq(
        head_dim, theta, rope_scaling, max_position_embeddings
    )
    inv_freq = jnp.asarray(inv_freq_np, jnp.float32)
    if resonance:
        # Resonance RoPE: round each wavelength to the nearest integer so
        # every frequency completes whole cycles within integer positions
        # (reference ResonanceLlamaRotaryEmbedding, utils_graphgpt.py:381-462).
        wavelength = 2.0 * jnp.pi / inv_freq
        inv_freq = 2.0 * jnp.pi / jnp.round(wavelength)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, P, Dh]
    cos = jnp.cos(emb) * attention_factor
    sin = jnp.sin(emb) * attention_factor
    return cos.astype(dtype), sin.astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B, P, H, Dh]; cos,sin: [B, P, Dh].

    The rotation is applied in q's dtype: cos/sin tables are built in f32
    (phase accuracy) but multiplying bf16 activations by f32 tables would
    promote the whole chain to f32 — measured on v5e as ~20 ms/step of
    convert traffic plus f32 cotangents (and layout copies) through every
    layer's backward."""
    cos = cos.astype(q.dtype)[:, :, None, :]
    sin = sin.astype(q.dtype)[:, :, None, :]
    q2 = q * cos + rotate_half(q) * sin
    k2 = k * cos + rotate_half(k) * sin
    return q2, k2.astype(k.dtype)


def reset_position_ids(position_ids: jnp.ndarray, rope_range: int, mpe: int):
    """Rescale positions into [0, rope_range) (reference reset_pos_ids,
    utils_graphgpt.py:583-590): pos * rope_range / (per-row max pos + 1).

    Returns float positions — the fractional part matters for RoPE phase;
    `rope_cos_sin` consumes them in float32. `mpe` is unused (kept for
    call-site compatibility); the reference normalises by each row's own
    maximum position, which keeps packed/short rows spanning the full range.
    """
    del mpe
    if rope_range <= 0:
        return position_ids
    pos = position_ids.astype(jnp.float32)
    row_max = jnp.max(pos, axis=-1, keepdims=True) + 1.0
    return pos * (float(rope_range) / row_max)


def rope_3d_cos_sin(
    position_ids_3d: jnp.ndarray,  # [B, P, 3] (discretized x/y/z coordinates)
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
):
    """3D rotary embedding (reference RotaryEmbedding3D,
    utils_graphgpt.py:465-550): signed frequency range with exponents from
    -Dh/2 to Dh/2 (so frequencies span base^{+1/2}..base^{-1/2} rather than
    1..base^{-1}), and the Dh/2 frequency slots interleave the three
    coordinate axes (x,y,z,x,y,z,...) by tiling each position triple
    ceil(Dh/6) times. Returns (cos, sin) of shape [B, P, head_dim]."""
    start = -(head_dim // 2)
    exponent = np.arange(start, start + head_dim, 2, dtype=np.float64) / head_dim
    freq = 1.0 / (theta**exponent)  # [Dh/2]
    expand_rate = int(np.ceil((head_dim // 2) / 3.0))
    b, p, _ = position_ids_3d.shape
    # [B, P, 3] -> [B, P, expand_rate, 3] -> [B, P, expand_rate*3] -> [:, :, :Dh/2]
    pos = jnp.broadcast_to(
        position_ids_3d.astype(jnp.float32)[:, :, None, :], (b, p, expand_rate, 3)
    ).reshape(b, p, expand_rate * 3)[:, :, : head_dim // 2]
    freqs = pos * jnp.asarray(freq, jnp.float32)[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def step_pos_emb(dim: int, mpe: int) -> np.ndarray:
    """Additive sinusoidal step-position table (reference get_step_pos_emb,
    utils_graphgpt.py:553-571): integer periods 1..dim/2, angular frequency
    2π/period, columns interleaved as (cos_0, sin_0, cos_1, sin_1, ...).
    Returns [mpe, dim] float32 (a static table — computed in NumPy)."""
    periods = np.arange(1, dim // 2 + 1, dtype=np.float64)
    freqs = 2.0 * np.pi / periods  # [dim/2]
    ang = np.arange(mpe, dtype=np.float64)[:, None] * freqs[None, :]  # [mpe, dim/2]
    out = np.empty((mpe, dim), dtype=np.float32)
    out[:, 0::2] = np.cos(ang)
    out[:, 1::2] = np.sin(ang)
    return out
