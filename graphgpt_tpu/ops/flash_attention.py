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
    q_ref, k_ref, v_ref, segq_ref, segk_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
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
        # log-sum-exp residual for the backward pass
        lse = m_ref[:, :1] + jnp.log(jnp.where(l == 0.0, 1.0, l))
        lse_ref[0, 0] = jnp.where(l[:, 0] == 0.0, _NEG_INF, lse[:, 0])


def _flash_fwd(q, k, v, segment_ids, causal, scale, bq, bk):
    """q,k,v: [BH, P, D] (heads folded into batch); segment_ids: [BH, P]."""
    bh, p, d = q.shape
    nq, nk = p // bq, p // bk
    seg3 = segment_ids.reshape(bh, 1, p)  # (.., 1, P): block (1,1,B) is tileable
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, bq=bq, bk=bk, nk=nk
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, seg3, seg3)
    return out, lse[:, 0, :]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------
def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref, segk_ref,
    dq_ref, acc_ref, *, scale, causal, bq, bk, nk
):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = True
    if causal:
        run = ki * bk <= qi * bq + (bq - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        valid = _mask_for_tiles(segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal)
        lse = lse_ref[0, 0][:, None]  # [BQ, 1]
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        delta = delta_ref[0, 0][:, None]
        ds = p * (dp - delta)
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref, segk_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, causal, bq, bk, nq
):
    ki, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = qi * bq + (bq - 1) >= ki * bk

    @pl.when(run)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]
        valid = _mask_for_tiles(segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal)
        lse = lse_ref[0, 0][:, None]
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        do = do_ref[0]
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, D]
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0][:, None]
        ds = p * (dp - delta)  # [BQ, BK]
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BK, D]

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, segment_ids, out, lse, do, causal, scale, bq, bk):
    bh, p, d = q.shape
    nq, nk = p // bq, p // bk
    seg3 = segment_ids.reshape(bh, 1, p)
    lse3 = lse.reshape(bh, 1, p)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta3 = delta.reshape(bh, 1, p)
    common = dict(scale=scale, causal=causal, bq=bq, bk=bk)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, nk=nk, **common),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse3, delta3, seg3, seg3)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, nq=nq, **common),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), lambda b, j, i: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse3, delta3, seg3, seg3)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry with custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, segment_ids, causal, scale):
    bq = _pick_block(q.shape[1])
    bk = _pick_block(q.shape[1])
    out, _ = _flash_fwd(q, k, v, segment_ids, causal, scale, bq, bk)
    return out


def _flash_core_fwd(q, k, v, segment_ids, causal, scale):
    bq = _pick_block(q.shape[1])
    bk = _pick_block(q.shape[1])
    out, lse = _flash_fwd(q, k, v, segment_ids, causal, scale, bq, bk)
    return out, (q, k, v, segment_ids, out, lse)


def _flash_core_bwd(causal, scale, residuals, g):
    q, k, v, segment_ids, out, lse = residuals
    bq = _pick_block(q.shape[1])
    bk = _pick_block(q.shape[1])
    dq, dk, dv = _flash_bwd(
        q, k, v, segment_ids, out, lse, g, causal, scale, bq, bk
    )
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
