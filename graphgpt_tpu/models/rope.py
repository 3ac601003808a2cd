"""Rotary position embeddings (HF-Llama rotate_half convention).

Matches the reference backbone's RoPE semantics (theta 1e4, head-dim pairs,
transformers LlamaRotaryEmbedding) so that converted reference checkpoints
reproduce activations. Also implements the reference's `rope_range`
position rescaling (src/models/graphgpt/utils_graphgpt.py:574-581) and
Resonance RoPE integer-wavelength rounding (utils_graphgpt.py:381-462).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    position_ids: jnp.ndarray,  # [B, P] int
    head_dim: int,
    theta: float = 10000.0,
    resonance: bool = False,
    dtype=jnp.float32,
):
    """Returns (cos, sin) of shape [B, P, head_dim]."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta**exponent)  # [Dh/2]
    if resonance:
        # Resonance RoPE: round each wavelength to the nearest integer so
        # every frequency completes whole cycles within integer positions
        # (reference ResonanceLlamaRotaryEmbedding, utils_graphgpt.py:381-462).
        wavelength = 2.0 * jnp.pi / inv_freq
        inv_freq = 2.0 * jnp.pi / jnp.round(wavelength)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [B, P, Dh]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B, P, H, Dh]; cos,sin: [B, P, Dh]."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q2 = q * cos + rotate_half(q) * sin
    k2 = k * cos + rotate_half(k) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


def reset_position_ids(position_ids: jnp.ndarray, rope_range: int, mpe: int):
    """Rescale positions into [0, rope_range) (reference reset_pos_ids,
    utils_graphgpt.py:574-581): pos * rope_range / mpe."""
    if rope_range <= 0:
        return position_ids
    return (position_ids.astype(jnp.float32) * (rope_range / mpe)).astype(
        position_ids.dtype
    )
