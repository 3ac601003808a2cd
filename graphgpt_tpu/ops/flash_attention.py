"""Pallas TPU flash attention with segment-id (packed) masking.

Replaces both the reference's SDPA/flash-attention dependency
(src/utils/misc_utils.py:511-515) and its host-materialised O(L^2)
block-diagonal masks (src/utils/tokenizer_utils.py:351-355): the mask is
reconstructed inside the kernel from per-token segment ids (0 = padding,
equal ids = same packed segment), composed with an optional causal
constraint.

Performance notes (v5e, dh=64 — the kernel is VPU-bound, not MXU-bound):
  - q/k/v stay in their native [B, P, H*Dh] layout (a free reshape of the
    projection output) — no physical [B,P,H,D] -> [B*H,P,D] transposes;
  - ALL heads are processed per grid step by an unrolled in-kernel loop:
    the segment/causal mask is built once per (q-tile, kv-tile) instead of
    once per head, kv tiles are fetched once for all heads, and grid-step
    overhead is amortised H-fold;
  - q arrives pre-scaled (softmax scale folded into the projection outside
    the kernel), saving a [BQ, BK] fp32 multiply per tile and head;
  - when the whole kv fits one block (P <= _MAX_SINGLE_BLOCK) a fast path
    runs a plain per-tile softmax with no online-softmax running stats;
  - masked logits sit at -1e30 so exp() zeroes them with no second
    `where`; fully-padded rows are zeroed with [BQ, Dh]-shaped row masks
    (on `out` in fwd, on `do` in bwd), never [BQ, BK]-shaped ones.

Forward (long-P path): online-softmax tiling — the kv axis iterated
sequentially per q tile; running max/denominator (one lane column per
head) and the output accumulator live in VMEM scratch; fp32 accumulation,
bf16 MXU matmuls.

Backward: flash-style recompute kernels (dq in one pass over kv tiles; dkv
in one pass over q tiles) — no [P, P] tensor is ever materialised.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# largest kv (or q) extent processed as ONE tile; above this the streaming
# online-softmax kernels take over. 2048x512 fp32 logits = 4 MiB VMEM.
_MAX_SINGLE_BLOCK = 2048
# raise the scoped-vmem cap for these kernels (XLA's 16 MiB default is far
# below the v5e's physical VMEM; big single-tile blocks need the headroom).
# Env-tunable after the MLP-kernel lesson (PERF.md round 4): oversized
# scoped requests starve the host->device input-transfer overlap.
_VMEM_LIMIT = int(os.environ.get("GGT_FLASH_VMEM", str(100 * 1024 * 1024)))


# sweepable q-tile target (tools/bench_sweep.py); 512 won the v5e sweep
_BQ_TARGET = int(os.environ.get("GGT_FLASH_BQ", "512"))


def _interpret() -> bool:
    """Generic Pallas interpreter mode — single source of truth lives in
    parallel.kernel_sharding.interpret_forced (lazy import: that module
    imports ops lazily, so a top-level import here would be circular)."""
    from ..parallel.kernel_sharding import interpret_forced

    return interpret_forced()


def _pick_block(p: int, target: int = 0) -> int:
    b = min(p, target or _BQ_TARGET)
    while p % b != 0:
        b //= 2
    return max(b, 1)


def _tile_neg(seg_q, seg_k, qi, ki, bq, bk, causal, bi_split: int = 0, p: int = 0):
    """[BQ, BK] additive mask (0 valid / -1e30 masked), built ONCE per tile
    and shared by every head.

    bi_split > 0 selects the reference's bi-causal binary-energy-decoding
    mode (src/utils/attn_mask_utils.py:128-155): rows before
    `split = P - bi_split` attend the bidirectional prefix only; rows
    at/after `split` attend causally to everything (within their segment).
    `ki` may be a traced scalar (the in-kernel kv band loop); `qi`,
    `bi_split` and `p` are static.
    """
    valid = (seg_q[:, None] == seg_k[None, :]) & (seg_k[None, :] > 0)
    if causal or bi_split > 0:
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if bi_split > 0:
            split = p - bi_split
            bi_rows = (rows < split) & (cols < split)
            causal_rows = (rows >= split) & (cols <= rows)
            valid = valid & (bi_rows | causal_rows)
        else:
            valid = valid & (rows >= cols)
    return jnp.where(valid, 0.0, _NEG_INF)


# ---------------------------------------------------------------------------
# Forward kernels (q pre-scaled; arrays [B, P, H*Dh]; lse [B, H, P])
# ---------------------------------------------------------------------------
def _rot_head(x, cos, sin, dh: int, inv: bool = False):
    """In-kernel RoPE of one head tile [BT, Dh] (cos/sin [BT, Dh], halves
    duplicated — the llama convention of models/rope.rope_cos_sin):
    y = x*cos + rotate_half(x)*sin. inv applies the transpose (= inverse,
    R is orthogonal) rotation for cotangents: sin -> -sin. f32 arithmetic,
    result in x.dtype. Folding the rotation into the flash kernels kills
    ~63 ms/step of XLA elementwise passes + [B,P,H,D] layout copies at the
    flagship shape (round-5 profile) — the VPU work rides under the
    MXU-bound attention matmuls."""
    h2 = dh // 2
    # native-dtype math: the outside apply_rope path multiplies in q.dtype
    # too, and an f32 round-trip measured ~1 ms/layer of extra VPU work
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    r = jnp.concatenate([-x[:, h2:], x[:, :h2]], axis=-1)
    if inv:
        return x * c - r * s
    return x * c + r * s


def _fwd_kernel_single(
    *refs,
    causal: bool, bq: int, bk: int, h: int, dh: int,
    bi_split: int = 0, p: int = 0, rope: bool = False
):
    """Whole kv in one tile: plain softmax, no running stats."""
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
         segq_ref, segk_ref, out_ref, lse_ref) = refs
    else:
        q_ref, k_ref, v_ref, segq_ref, segk_ref, out_ref, lse_ref = refs
    qi = pl.program_id(1)
    neg = _tile_neg(
        segq_ref[0, 0], segk_ref[0, 0], qi, 0, bq, bk, causal, bi_split, p
    )
    rowvalid = segq_ref[0, 0][:, None] > 0
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        if rope:
            q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
            k = _rot_head(k, ck_ref[0], sk_ref[0], dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + neg
        m = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        pij = jnp.exp(s - m)  # masked entries -> 0 (or 1s on fully-padded rows)
        l = jnp.sum(pij, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            pij.astype(v_ref.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, sl] = jnp.where(rowvalid, pv / l, 0.0).astype(out_ref.dtype)
        lse = m[:, 0] + jnp.log(l[:, 0])
        lse_ref[0, i] = jnp.where(m[:, 0] <= _NEG_INF, _NEG_INF, lse)


def _seg_overlap(seg_q, seg_k):
    """Scalar bool: does any segment id appear in BOTH tiles? Packed rows
    carry increasing contiguous ids, so id-range overlap is exact; padding
    (id 0) never matches. The basis of the (q-tile, kv-tile) skip — on the
    flagship packed workloads (~32-token segments) most tile pairs are
    fully masked and skipping them is the round-4 headline win."""
    big = jnp.int32(2**30)
    qmax = jnp.max(seg_q)
    kmax = jnp.max(seg_k)
    qmin = jnp.min(jnp.where(seg_q > 0, seg_q, big))
    kmin = jnp.min(jnp.where(seg_k > 0, seg_k, big))
    return (qmax > 0) & (kmax > 0) & (qmin <= kmax) & (kmin <= qmax)


def _fwd_kernel_stream(
    *refs,
    causal: bool, bq: int, bk: int, nk: int, h: int, dh: int,
    bi_split: int = 0, p: int = 0, rope: bool = False
):
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, segq_ref,
         segk_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref) = refs
    else:
        (q_ref, k_ref, v_ref, segq_ref, segk_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    ki = pl.program_id(2)
    qi = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # skip (q-tile, kv-tile) pairs with no segment in common, and fully-
    # masked strictly-above-diagonal tiles under causality
    run = _seg_overlap(segq_ref[0, 0], segk_ref[0, 0])
    if causal:
        run &= ki * bk <= qi * bq + (bq - 1)

    @pl.when(run)
    def _step():
        neg = _tile_neg(
            segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal, bi_split, p
        )
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0, :, sl]
            k = k_ref[0, :, sl]
            if rope:
                q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
                k = _rot_head(k, ck_ref[0], sk_ref[0], dh)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + neg  # [BQ, BK]
            # running max/denominator columns for this head
            m_prev = m_ref[:, i : i + 1]  # [BQ, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            pij = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
            l_ref[:, i : i + 1] = l_ref[:, i : i + 1] * alpha + jnp.sum(
                pij, axis=-1, keepdims=True
            )
            m_ref[:, i : i + 1] = m_new
            pv = jax.lax.dot_general(
                pij.astype(v_ref.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv

    @pl.when(ki == nk - 1)
    def _finish():
        rowvalid = segq_ref[0, 0][:, None] > 0
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            l = l_ref[:, i : i + 1]
            lsafe = jnp.where(l == 0.0, 1.0, l)
            out_ref[0, :, sl] = jnp.where(
                rowvalid, acc_ref[:, sl] / lsafe, 0.0
            ).astype(out_ref.dtype)
            lse = m_ref[:, i] + jnp.log(lsafe[:, 0])
            lse_ref[0, i] = jnp.where(l[:, 0] == 0.0, _NEG_INF, lse)


# ---------------------------------------------------------------------------
# Band kernels: exploit block-diagonal sparsity of packed segments.
#
# The flagship workloads pack ~31 graph segments (mean length ~32 tokens)
# into each mpe-1024 row, so the bidirectional segment mask is extremely
# block-sparse: a query attends only its own segment. The reference pays the
# full O(L^2) for this (host-materialised block-diag masks,
# src/utils/tokenizer_utils.py:351-355); the kernels above also visit every
# (q-tile, kv-tile) pair. These kernels instead keep the WHOLE kv block in
# VMEM (fetched once per batch row, same DMA as the single-block path) and,
# per q tile, run an in-kernel fori_loop over only the kv sub-tiles whose
# segment-id range overlaps the q tile's — packing assigns increasing ids,
# so the overlap region is one contiguous band of width ~(bq + 2*mean_seg).
# Fully-padded tails fall out for free (seg 0 never enters the band).
# ---------------------------------------------------------------------------


def _band_limits(seg_q, seg_k, p, bk):
    """Scalar (jlo, jhi) kv sub-tile band for this q tile: the tiles holding
    any kv position whose segment id falls inside the q tile's [qmin, qmax].
    Ids only need to be *clustered* for efficiency; correctness needs only
    that every matching column lies inside [min pos, max pos] of matching
    ids, which holds by construction. Returns jhi < jlo when the q tile is
    all padding."""
    big = jnp.int32(2**30)
    qmax = jnp.max(seg_q)
    qmin = jnp.min(jnp.where(seg_q > 0, seg_q, big))
    match = (seg_k >= qmin) & (seg_k <= qmax) & (seg_k > 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, seg_k.shape, 0)
    lo = jnp.min(jnp.where(match, pos, jnp.int32(p)))
    hi = jnp.max(jnp.where(match, pos, jnp.int32(-1)))
    return lo // bk, hi // bk


def _fwd_kernel_band(
    q_ref, k_ref, v_ref, segq_ref, segk_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, causal: bool, bq: int, bk: int, h: int, dh: int, p: int, bi_split: int
):
    """Grid (b, nq); k/v/seg_k blocks span the whole kv axis (index map
    constant in qi, so they are fetched once per batch row); acc/m/l live in
    VMEM scratch mutated by the fori_loop body."""
    qi = pl.program_id(1)
    seg_q = segq_ref[0, :, 0]  # [bq]
    seg_k_full = segk_ref[0, :, 0]  # [p]
    jlo, jhi = _band_limits(seg_q, seg_k_full, p, bk)
    if causal:
        jhi = jnp.minimum(jhi, (qi * bq + bq - 1) // bk)
    elif bi_split > 0:
        split = p - bi_split
        # tiles with causal rows reach to the row diagonal; bi-only tiles
        # see the prefix (qi is a traced program_id -> jnp.where, not `if`)
        has_causal = qi * bq + bq - 1 >= split
        jhi = jnp.minimum(
            jhi,
            jnp.where(has_causal, (qi * bq + bq - 1) // bk, (split - 1) // bk),
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def body(j, _):
        start = pl.multiple_of(j * bk, bk)
        seg_k = segk_ref[0, pl.ds(start, bk), 0]  # [bk]
        neg = _tile_neg(seg_q, seg_k, qi, j, bq, bk, causal, bi_split, p)
        k_blk = k_ref[0, pl.ds(start, bk), :]  # [bk, H*Dh]
        v_blk = v_ref[0, pl.ds(start, bk), :]
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            s = jax.lax.dot_general(
                q_ref[0, :, sl], k_blk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + neg  # [BQ, BK]
            m_prev = m_ref[:, i : i + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            pij = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, i : i + 1] = l_ref[:, i : i + 1] * alpha + jnp.sum(
                pij, axis=-1, keepdims=True
            )
            m_ref[:, i : i + 1] = m_new
            pv = jax.lax.dot_general(
                pij.astype(v_blk.dtype), v_blk[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv
        return 0

    jax.lax.fori_loop(jlo, jhi + 1, body, 0)

    rowvalid = seg_q[:, None] > 0
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        l = l_ref[:, i : i + 1]
        lsafe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, :, sl] = jnp.where(
            rowvalid, acc_ref[:, sl] / lsafe, 0.0
        ).astype(out_ref.dtype)
        lse = m_ref[:, i] + jnp.log(lsafe[:, 0])
        lse_ref[0, i] = jnp.where(l[:, 0] == 0.0, _NEG_INF, lse)


def _flash_fwd_band(q, k, v, seg_q, seg_k, causal, bq, bk, h, dh, bi_split=0):
    b, p, hd = q.shape
    nq = p // bq
    segq3 = seg_q.reshape(b, p, 1)
    segk3 = seg_k.reshape(b, p, 1)
    qspec = pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0))
    kspec = pl.BlockSpec((1, p, hd), lambda b, i: (b, 0, 0))
    sq = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0))
    sk = pl.BlockSpec((1, p, 1), lambda b, i: (b, 0, 0))
    lspec = pl.BlockSpec((1, h, bq), lambda b, i: (b, 0, i))
    kernel = functools.partial(
        _fwd_kernel_band, causal=causal, bq=bq, bk=bk, h=h, dh=dh, p=p,
        bi_split=bi_split,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[qspec, kspec, kspec, sq, sk],
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, segq3, segk3)
    return out, lse


# kernel-mode knob (GGT_FLASH_MODE) — all three modes are numerically
# identical; the default follows the v5e measurements (PERF.md round 4):
#   legacy — dense-tile dispatch with the single-block fast paths. FASTEST:
#            at dh=64 the no-running-stats single-block softmax beats every
#            tiled variant even when tiling enables sparsity skipping.
#   skip   — stream kernels with per-(q-tile, kv-tile) segment-overlap
#            skipping (packed block-diagonal masks make most tile pairs
#            dead) — measured SLOWER: the online-softmax stat updates and
#            acc rescales cost more than the skipped tiles saved.
#   band   — in-kernel fori_loop over the segment band — measured SLOWER:
#            the dynamic loop defeats Mosaic's grid pipelining.
# Block-diagonal sparsity is instead exploited OUTSIDE the kernel via
# block-aligned packing + the attn_block reshape (ops/attention.py), which
# keeps the single-block fast path while shrinking its P.
_MODE = os.environ.get("GGT_FLASH_MODE", "legacy")
# kv tile width for the skip/band modes
_BAND_BK = int(os.environ.get("GGT_FLASH_BK", "256"))
# above this P the full kv block + fp32 dk/dv scratch no longer fit VMEM
# comfortably; the streaming pair kernels take over
_MAX_BAND = 4096


def _flash_fwd(q, k, v, seg_q, seg_k, causal, bq, bk, h, dh, bi_split=0,
               rope=None):
    """q,k,v: [B, P, H*Dh] with q pre-scaled; seg_q/seg_k: [B, P] (distinct
    arrays for ring-attention chunks where the kv segments rotate).
    rope: optional (cos, sin) [B, P, Dh] — q/k rotated IN-kernel per head
    tile (callers pass RAW q/k then; see _rot_head).

    Returns out [B, P, H*Dh] and lse [B, H, P]."""
    b, p, hd = q.shape
    if _MODE == "band" and p <= _MAX_BAND:
        assert rope is None, "band kernels take pre-rotated q/k"
        bq_b = _pick_block(p)
        bk_b = _pick_block(p, _BAND_BK)
        return _flash_fwd_band(
            q, k, v, seg_q, seg_k, causal, bq_b, bk_b, h, dh, bi_split
        )
    if _MODE == "skip":
        # tile the kv axis even when it would fit one block, so the
        # per-(q-tile, kv-tile) segment-overlap skip in the stream kernel
        # can drop the dead tiles of packed block-diagonal masks
        bq = _pick_block(p)
        bk = _pick_block(p, _BAND_BK)
    nq, nk = p // bq, p // bk
    segq3 = seg_q.reshape(b, 1, p)
    segk3 = seg_k.reshape(b, 1, p)
    qspec = pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0))
    segq = pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i))
    segk = pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j))
    lspec = pl.BlockSpec((1, h, bq), lambda b, i, j: (b, 0, i))
    out_shape = [
        jax.ShapeDtypeStruct((b, p, hd), q.dtype),
        jax.ShapeDtypeStruct((b, h, p), jnp.float32),
    ]
    if nk == 1:
        kernel = functools.partial(
            _fwd_kernel_single, causal=causal, bq=bq, bk=bk, h=h, dh=dh,
            bi_split=bi_split, p=p, rope=rope is not None,
        )
        scratch = []
    else:
        kernel = functools.partial(
            _fwd_kernel_stream, causal=causal, bq=bq, bk=bk, nk=nk, h=h, dh=dh,
            bi_split=bi_split, p=p, rope=rope is not None,
        )
        scratch = [
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ]
    inputs = [q, k, v]
    in_specs = [qspec, kspec, kspec]
    if rope is not None:
        cqspec = pl.BlockSpec((1, bq, dh), lambda b, i, j: (b, i, 0))
        ckspec = pl.BlockSpec((1, bk, dh), lambda b, i, j: (b, j, 0))
        inputs += [rope[0], rope[1], rope[0], rope[1]]
        in_specs += [cqspec, cqspec, ckspec, ckspec]
    inputs += [segq3, segk3]
    in_specs += [segq, segk]
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=in_specs,
        out_specs=[qspec, lspec],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*inputs)
    return out, lse


def _bwd_kernel_band(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref, segk_ref,
    dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc,
    *, causal: bool, bq: int, bk: int, nq: int, h: int, dh: int, p: int,
    bi_split: int
):
    """Fused band backward: one pass over the (q-tile, banded kv sub-tile)
    pairs produces dq, dk AND dv — logits/softmax and the tile mask built
    once per live pair (5 MXU matmuls instead of the 7 a split dq/dkv pair
    costs), and dead kv sub-tiles outside the q tile's segment band are
    never touched. dk/dv accumulate into full-kv fp32 scratch across q tiles
    (grid axis `arbitrary`), flushed on the last tile."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    seg_q = segq_ref[0, :, 0]
    seg_k_full = segk_ref[0, :, 0]
    jlo, jhi = _band_limits(seg_q, seg_k_full, p, bk)
    if causal:
        jhi = jnp.minimum(jhi, (qi * bq + bq - 1) // bk)
    elif bi_split > 0:
        split = p - bi_split
        has_causal = qi * bq + bq - 1 >= split
        jhi = jnp.minimum(
            jhi,
            jnp.where(has_causal, (qi * bq + bq - 1) // bk, (split - 1) // bk),
        )
    rowvalid = seg_q[:, None] > 0

    dq_acc[:] = jnp.zeros_like(dq_acc)

    def body(j, _):
        start = pl.multiple_of(j * bk, bk)
        seg_k = segk_ref[0, pl.ds(start, bk), 0]
        neg = _tile_neg(seg_q, seg_k, qi, j, bq, bk, causal, bi_split, p)
        k_blk = k_ref[0, pl.ds(start, bk), :]
        v_blk = v_ref[0, pl.ds(start, bk), :]
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0, :, sl]
            s = jax.lax.dot_general(
                q, k_blk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + neg  # [BQ, BK]
            pij = jnp.exp(s - lse_ref[0, i][:, None])
            do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
            dv_acc[pl.ds(start, bk), sl] += jax.lax.dot_general(
                pij.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BK, Dh]
            dp = jax.lax.dot_general(
                do, v_blk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            ds = pij * (dp - delta_ref[0, i][:, None])
            dq_acc[:, sl] += jax.lax.dot_general(
                ds.astype(k_blk.dtype), k_blk[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[pl.ds(start, bk), sl] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BK, Dh]
        return 0

    jax.lax.fori_loop(jlo, jhi + 1, body, 0)
    dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_band(q, k, v, segq3, segk3, delta, lse, do, causal, h, dh,
                    bq, bk, bi_split=0):
    b, p, hd = q.shape
    nq = p // bq
    qspec = pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0))
    kspec = pl.BlockSpec((1, p, hd), lambda b, i: (b, 0, 0))
    sq = pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0))
    sk = pl.BlockSpec((1, p, 1), lambda b, i: (b, 0, 0))
    rowq = pl.BlockSpec((1, h, bq), lambda b, i: (b, 0, i))
    kernel = functools.partial(
        _bwd_kernel_band, causal=causal, bq=bq, bk=bk, nq=nq, h=h, dh=dh,
        p=p, bi_split=bi_split,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[qspec, kspec, kspec, qspec, rowq, rowq, sq, sk],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, hd), q.dtype),
            jax.ShapeDtypeStruct((b, p, hd), k.dtype),
            jax.ShapeDtypeStruct((b, p, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((p, hd), jnp.float32),
            pltpu.VMEM((p, hd), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(q, k, v, do, lse, delta, segq3, segk3)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Backward kernels (q pre-scaled; dq returned in pre-scaled units)
# ---------------------------------------------------------------------------
def _dq_kernel_single(
    *refs, causal, bq, bk, h, dh, bi_split=0, p=0, rope=False
):
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, do_ref,
         lse_ref, delta_ref, segq_ref, segk_ref, dq_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref,
         segk_ref, dq_ref) = refs
    qi = pl.program_id(1)
    neg = _tile_neg(
        segq_ref[0, 0], segk_ref[0, 0], qi, 0, bq, bk, causal, bi_split, p
    )
    rowvalid = segq_ref[0, 0][:, None] > 0
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        if rope:
            q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
            k = _rot_head(k, ck_ref[0], sk_ref[0], dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + neg
        pij = jnp.exp(s - lse_ref[0, i][:, None])
        # [BQ,1] row mask on do zeroes every padding-row contribution
        do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        ds = pij * (dp - delta_ref[0, i][:, None])
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rope:
            # dq is w.r.t. the ROTATED q: transpose-rotate back to raw q
            dq = _rot_head(dq, cq_ref[0], sq_ref[0], dh, inv=True)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _dq_kernel_stream(
    *refs, causal, bq, bk, nk, h, dh, bi_split=0, p=0, rope=False
):
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, do_ref,
         lse_ref, delta_ref, segq_ref, segk_ref, dq_ref, acc_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref,
         segk_ref, dq_ref, acc_ref) = refs
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = _seg_overlap(segq_ref[0, 0], segk_ref[0, 0])
    if causal:
        run &= ki * bk <= qi * bq + (bq - 1)

    @pl.when(run)
    def _step():
        neg = _tile_neg(
            segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal, bi_split, p
        )
        rowvalid = segq_ref[0, 0][:, None] > 0
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0, :, sl]
            k = k_ref[0, :, sl]
            if rope:
                q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
                k = _rot_head(k, ck_ref[0], sk_ref[0], dh)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + neg
            pij = jnp.exp(s - lse_ref[0, i][:, None])
            do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
            dp = jax.lax.dot_general(
                do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, BK]
            ds = pij * (dp - delta_ref[0, i][:, None])
            acc_ref[:, sl] += jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == nk - 1)
    def _finish():
        if rope:
            # accumulated in rotated-q space: transpose-rotate per head
            for i in range(h):
                sl = slice(i * dh, (i + 1) * dh)
                dq_ref[0, :, sl] = _rot_head(
                    acc_ref[:, sl], cq_ref[0], sq_ref[0], dh, inv=True
                ).astype(dq_ref.dtype)
        else:
            dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_kernel_fused(
    *refs, causal, bq, bk, nq, h, dh, bi_split=0, p=0, rope=False
):
    """Single-block backward: kv spans one tile (P <= _MAX_SINGLE_BLOCK), q
    streamed in bq tiles. Computes dq, dk AND dv in one pass so the [BQ, BK]
    logits/softmax (and the tile mask) are built once per (q-tile, head)
    instead of once in a dq kernel and again in a dkv kernel — 5 MXU
    matmuls per head per tile instead of 7, and half the exp() traffic.

    delta (= rowsum(do*out) - dlse) is computed IN-kernel per (q-tile,
    head) from the out residual: the external bhp-layout einsum cost
    ~14 ms/step in layout copies alone at the flagship shape."""
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, do_ref,
         lse_ref, out_ref, dlse_ref, segq_ref, segk_ref,
         dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, out_ref, dlse_ref, segq_ref,
         segk_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    neg = _tile_neg(
        segq_ref[0, 0], segk_ref[0, 0], qi, 0, bq, bk, causal, bi_split, p
    )
    rowvalid = segq_ref[0, 0][:, None] > 0
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        if rope:
            q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
            k = _rot_head(k, ck_ref[0], sk_ref[0], dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + neg  # [BQ, BK]
        pij = jnp.exp(s - lse_ref[0, i][:, None])
        do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
        delta = jnp.sum(
            do.astype(jnp.float32) * out_ref[0, :, sl].astype(jnp.float32),
            axis=-1,
            keepdims=True,
        ) - dlse_ref[0, i][:, None]
        dv_acc[:, sl] += jax.lax.dot_general(
            pij.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, Dh]
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        ds = pij * (dp - delta)
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rope:
            dq = _rot_head(dq, cq_ref[0], sq_ref[0], dh, inv=True)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, Dh]

    @pl.when(qi == nq - 1)
    def _finish():
        if rope:
            # dk accumulated against ROTATED k: transpose-rotate per head
            for i in range(h):
                sl = slice(i * dh, (i + 1) * dh)
                dk_ref[0, :, sl] = _rot_head(
                    dk_acc[:, sl], ck_ref[0], sk_ref[0], dh, inv=True
                ).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dkv_kernel_single(
    *refs, causal, bq, bk, h, dh, bi_split=0, p=0, rope=False
):
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, do_ref,
         lse_ref, delta_ref, segq_ref, segk_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref,
         segk_ref, dk_ref, dv_ref) = refs
    ki = pl.program_id(1)
    neg = _tile_neg(
        segq_ref[0, 0], segk_ref[0, 0], 0, ki, bq, bk, causal, bi_split, p
    )
    rowvalid = segq_ref[0, 0][:, None] > 0
    for i in range(h):
        sl = slice(i * dh, (i + 1) * dh)
        q = q_ref[0, :, sl]
        kk = k_ref[0, :, sl]
        if rope:
            q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
            kk = _rot_head(kk, ck_ref[0], sk_ref[0], dh)
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + neg  # [BQ, BK]
        pij = jnp.exp(s - lse_ref[0, i][:, None])
        do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
        dv = jax.lax.dot_general(
            pij.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, Dh]
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = pij * (dp - delta_ref[0, i][:, None])  # [BQ, BK]
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, Dh]
        if rope:
            dk = _rot_head(dk, ck_ref[0], sk_ref[0], dh, inv=True)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _dkv_kernel_stream(
    *refs, causal, bq, bk, nq, h, dh, bi_split=0, p=0, rope=False
):
    if rope:
        (q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, do_ref,
         lse_ref, delta_ref, segq_ref, segk_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, segq_ref,
         segk_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
    ki, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = _seg_overlap(segq_ref[0, 0], segk_ref[0, 0])
    if causal:
        run &= qi * bq + (bq - 1) >= ki * bk

    @pl.when(run)
    def _step():
        neg = _tile_neg(
            segq_ref[0, 0], segk_ref[0, 0], qi, ki, bq, bk, causal, bi_split, p
        )
        rowvalid = segq_ref[0, 0][:, None] > 0
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            q = q_ref[0, :, sl]
            kk = k_ref[0, :, sl]
            if rope:
                q = _rot_head(q, cq_ref[0], sq_ref[0], dh)
                kk = _rot_head(kk, ck_ref[0], sk_ref[0], dh)
            s = jax.lax.dot_general(
                q, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + neg  # [BQ, BK]
            pij = jnp.exp(s - lse_ref[0, i][:, None])
            do = jnp.where(rowvalid, do_ref[0, :, sl], 0.0)
            dv_acc[:, sl] += jax.lax.dot_general(
                pij.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BK, Dh]
            dp = jax.lax.dot_general(
                do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = pij * (dp - delta_ref[0, i][:, None])  # [BQ, BK]
            dk_acc[:, sl] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BK, Dh]

    @pl.when(qi == nq - 1)
    def _finish():
        if rope:
            for i in range(h):
                sl = slice(i * dh, (i + 1) * dh)
                dk_ref[0, :, sl] = _rot_head(
                    dk_acc[:, sl], ck_ref[0], sk_ref[0], dh, inv=True
                ).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, seg_q, seg_k, out, lse, do, causal, h, dh, dlse=None,
               bi_split=0, rope=None):
    """dlse: optional [B, H, P] cotangent of the lse output (ring-attention
    combine); folds into the delta term: ds = p*(dp - delta + dlse).
    rope: optional (cos, sin) [B, P, Dh] — q/k arrive RAW, the kernels
    rotate them and transpose-rotate dq/dk back (see _rot_head)."""
    b, p, hd = q.shape
    segq3 = seg_q.reshape(b, 1, p)
    segk3 = seg_k.reshape(b, 1, p)
    if _MODE not in ("band", "skip") and p <= _MAX_SINGLE_BLOCK and bi_split == 0:
        # fused single-block path (the flagship configs): delta is computed
        # IN-kernel from the out residual — the external bhp einsum cost
        # ~14 ms/step in bhp-layout copies at the flagship shape. dlse
        # (ring lse cotangent) folds in as an extra row input; zeros when
        # absent ([B, H, P] f32 = 3 MB, fused away by XLA).
        dlse_in = (
            dlse.astype(jnp.float32)
            if dlse is not None
            else jnp.zeros((b, h, p), jnp.float32)
        )
        return _flash_bwd_fused(
            q, k, v, segq3, segk3, out, dlse_in, lse, do, causal, h, dh,
            rope=rope,
        )
    assert rope is None or _MODE not in ("band", "skip"), (
        "band/skip bwd kernels take pre-rotated q/k"
    )
    # fp32 accumulation WITHOUT materialising fp32 copies of do/out:
    # an explicit .astype(f32) here produced two 200MB fp32 tensors (plus
    # layout copies) per layer in the profile; preferred_element_type keeps
    # the upcast inside the reduction
    delta = jnp.einsum(
        "bphd,bphd->bhp",
        do.reshape(b, p, h, dh),
        out.reshape(b, p, h, dh),
        preferred_element_type=jnp.float32,
    )
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    if _MODE == "band" and p <= _MAX_BAND:
        bq_b = _pick_block(p, _BQ_BWD)
        bk_b = _pick_block(p, _BAND_BK)
        return _flash_bwd_band(
            q, k, v, segq3.reshape(b, p, 1), segk3.reshape(b, p, 1), delta,
            lse, do, causal, h, dh, bq_b, bk_b, bi_split,
        )
    if _MODE == "skip":
        # stream pair with tiled kv/q so the segment-overlap skip engages
        bq = _pick_block(p, _BQ_BWD)
        bk = _pick_block(p, _BAND_BK)
    else:
        # dq: whole kv per tile when it fits
        bq = _pick_block(p)
        bk = p if p <= _MAX_SINGLE_BLOCK else _pick_block(p, 1024)
    nq, nk = p // bq, p // bk
    qspec = pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0))
    rowq = pl.BlockSpec((1, h, bq), lambda b, i, j: (b, 0, i))
    segq = pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i))
    segk = pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j))
    common = dict(
        causal=causal, bq=bq, bk=bk, h=h, dh=dh, bi_split=bi_split, p=p,
        rope=rope is not None,
    )
    if nk == 1:
        dq_kernel = functools.partial(_dq_kernel_single, **common)
        dq_scratch = []
    else:
        dq_kernel = functools.partial(_dq_kernel_stream, nk=nk, **common)
        dq_scratch = [pltpu.VMEM((bq, hd), jnp.float32)]
    dq_inputs = [q, k, v]
    dq_specs = [qspec, kspec, kspec]
    if rope is not None:
        cq = pl.BlockSpec((1, bq, dh), lambda b, i, j: (b, i, 0))
        ck = pl.BlockSpec((1, bk, dh), lambda b, i, j: (b, j, 0))
        dq_inputs += [rope[0], rope[1], rope[0], rope[1]]
        dq_specs += [cq, cq, ck, ck]
    dq_inputs += [do, lse, delta, segq3, segk3]
    dq_specs += [qspec, rowq, rowq, segq, segk]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, nq, nk),
        in_specs=dq_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, p, hd), q.dtype),
        scratch_shapes=dq_scratch,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*dq_inputs)
    # dkv: swap the roles — kv tiles on the parallel axis, q streamed
    if _MODE == "skip":
        bq2, bk2 = _pick_block(p, _BAND_BK), _pick_block(p, _BQ_BWD)
    else:
        bq2 = p if p <= _MAX_SINGLE_BLOCK else _pick_block(p, 1024)
        bk2 = _pick_block(p)
    nq2, nk2 = p // bq2, p // bk2
    qspec2 = pl.BlockSpec((1, bq2, hd), lambda b, j, i: (b, i, 0))
    kspec2 = pl.BlockSpec((1, bk2, hd), lambda b, j, i: (b, j, 0))
    rowq2 = pl.BlockSpec((1, h, bq2), lambda b, j, i: (b, 0, i))
    segq2 = pl.BlockSpec((1, 1, bq2), lambda b, j, i: (b, 0, i))
    segk2 = pl.BlockSpec((1, 1, bk2), lambda b, j, i: (b, 0, j))
    common2 = dict(
        causal=causal, bq=bq2, bk=bk2, h=h, dh=dh, bi_split=bi_split, p=p,
        rope=rope is not None,
    )
    if nq2 == 1:
        dkv_kernel = functools.partial(_dkv_kernel_single, **common2)
        dkv_scratch = []
    else:
        dkv_kernel = functools.partial(_dkv_kernel_stream, nq=nq2, **common2)
        dkv_scratch = [
            pltpu.VMEM((bk2, hd), jnp.float32),
            pltpu.VMEM((bk2, hd), jnp.float32),
        ]
    dkv_inputs = [q, k, v]
    dkv_specs = [qspec2, kspec2, kspec2]
    if rope is not None:
        cq2 = pl.BlockSpec((1, bq2, dh), lambda b, j, i: (b, i, 0))
        ck2 = pl.BlockSpec((1, bk2, dh), lambda b, j, i: (b, j, 0))
        dkv_inputs += [rope[0], rope[1], rope[0], rope[1]]
        dkv_specs += [cq2, cq2, ck2, ck2]
    dkv_inputs += [do, lse, delta, segq3, segk3]
    dkv_specs += [qspec2, rowq2, rowq2, segq2, segk2]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, nk2, nq2),
        in_specs=dkv_specs,
        out_specs=[kspec2, kspec2],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, hd), k.dtype),
            jax.ShapeDtypeStruct((b, p, hd), v.dtype),
        ],
        scratch_shapes=dkv_scratch,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*dkv_inputs)
    return dq, dk, dv


# fused-backward q-tile: 1024 won the round-5 sweep (113.8k vs 110.9k at
# bq=512 — with the in-kernel rope, one whole-block q tile rotates k once
# and halves the per-tile loop overhead; the fwd kernel at bq=1024 and the
# combination both measured lower). 0 -> _BQ_TARGET.
_BQ_BWD = int(os.environ.get("GGT_FLASH_BQ_BWD", "1024"))


def _flash_bwd_fused(q, k, v, segq3, segk3, out, dlse, lse, do, causal, h, dh,
                     rope=None):
    """One pallas_call producing (dq, dk, dv) when the whole kv axis fits a
    single tile; see _bwd_kernel_fused."""
    b, p, hd = q.shape
    bq, bk = _pick_block(p, _BQ_BWD), p
    nq = p // bq
    qspec = pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0))
    kspec = pl.BlockSpec((1, bk, hd), lambda b, i: (b, 0, 0))
    rowq = pl.BlockSpec((1, h, bq), lambda b, i: (b, 0, i))
    segq = pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i))
    segk = pl.BlockSpec((1, 1, bk), lambda b, i: (b, 0, 0))
    kernel = functools.partial(
        _bwd_kernel_fused, causal=causal, bq=bq, bk=bk, nq=nq, h=h, dh=dh,
        rope=rope is not None,
    )
    inputs = [q, k, v]
    in_specs = [qspec, kspec, kspec]
    if rope is not None:
        cq = pl.BlockSpec((1, bq, dh), lambda b, i: (b, i, 0))
        ck = pl.BlockSpec((1, bk, dh), lambda b, i: (b, 0, 0))
        inputs += [rope[0], rope[1], rope[0], rope[1]]
        in_specs += [cq, cq, ck, ck]
    inputs += [do, lse, out, dlse, segq3, segk3]
    in_specs += [qspec, rowq, qspec, rowq, segq, segk]
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=in_specs,
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, hd), q.dtype),
            jax.ShapeDtypeStruct((b, p, hd), k.dtype),
            jax.ShapeDtypeStruct((b, p, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(*inputs)
    return dq, dk, dv


def _fwd_blocks(p: int):
    bq = _pick_block(p)
    bk = p if p <= _MAX_SINGLE_BLOCK else _pick_block(p, 1024)
    return bq, bk


# ---------------------------------------------------------------------------
# Public entry (q pre-scaled by the caller wrapper)
#
# The forward pallas_call and the gradient attachment are deliberately SPLIT:
# the raw kernel outputs (out, lse) are checkpoint-named intermediates, and
# an identity custom_vjp (_attach_grad) that RECEIVES them as inputs carries
# the backward. Under jax.checkpoint with the save_attn policy
# (save_only_these_names("attn_out", "attn_lse")) the backward recompute
# reconstructs (qs, k, v) from the cheap projections but skips re-running
# the VPU-bound forward kernel entirely — a plain custom_vjp would hide
# (out, lse) as opaque residuals and force the rerun.
# ---------------------------------------------------------------------------
SAVE_ATTN_NAMES = ("attn_out", "attn_lse")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _attach_grad(qs, k, v, seg_q, seg_k, out, lse, causal, h, dh, bi_split=0):
    return out


def _attach_grad_fwd(qs, k, v, seg_q, seg_k, out, lse, causal, h, dh, bi_split=0):
    return out, (qs, k, v, seg_q, seg_k, out, lse)


def _attach_grad_bwd(causal, h, dh, bi_split, residuals, g):
    qs, k, v, seg_q, seg_k, out, lse = residuals
    dqs, dk, dv = _flash_bwd(
        qs, k, v, seg_q, seg_k, out, lse, g, causal, h, dh, bi_split=bi_split
    )
    # zero cotangents for the (stop-gradiented) out/lse inputs
    return dqs, dk, dv, None, None, jnp.zeros_like(out), jnp.zeros_like(lse)


_attach_grad.defvjp(_attach_grad_fwd, _attach_grad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _attach_grad_rope(qs, k, v, seg_q, seg_k, out, lse, cos, sin, causal, h,
                      dh, bi_split=0):
    """_attach_grad variant for IN-KERNEL rope: q/k residuals are RAW
    (pre-rotation) — the backward kernels rotate them and transpose-rotate
    dq/dk, so the rotation never materialises in HBM in either direction.
    cos/sin descend from integer position ids; their cotangents are zero."""
    return out


def _attach_grad_rope_fwd(qs, k, v, seg_q, seg_k, out, lse, cos, sin, causal,
                          h, dh, bi_split=0):
    return out, (qs, k, v, seg_q, seg_k, out, lse, cos, sin)


def _attach_grad_rope_bwd(causal, h, dh, bi_split, residuals, g):
    qs, k, v, seg_q, seg_k, out, lse, cos, sin = residuals
    dqs, dk, dv = _flash_bwd(
        qs, k, v, seg_q, seg_k, out, lse, g, causal, h, dh,
        bi_split=bi_split, rope=(cos, sin),
    )
    return (
        dqs, dk, dv, None, None, jnp.zeros_like(out), jnp.zeros_like(lse),
        jnp.zeros_like(cos), jnp.zeros_like(sin),
    )


_attach_grad_rope.defvjp(_attach_grad_rope_fwd, _attach_grad_rope_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _attach_grad_lse(qs, k, v, seg_q, seg_k, out, lse, causal, h, dh):
    """Variant exposing (out, lse) as differentiable outputs — the ring
    combine consumes lse, so its cotangent must flow: it folds into the
    kernel's delta term as ds = p * (dp - delta + dlse)."""
    return out, lse


def _attach_grad_lse_fwd(qs, k, v, seg_q, seg_k, out, lse, causal, h, dh):
    return (out, lse), (qs, k, v, seg_q, seg_k, out, lse)


def _attach_grad_lse_bwd(causal, h, dh, residuals, gs):
    qs, k, v, seg_q, seg_k, out, lse = residuals
    g_out, g_lse = gs
    dqs, dk, dv = _flash_bwd(
        qs, k, v, seg_q, seg_k, out, lse, g_out, causal, h, dh, dlse=g_lse
    )
    return dqs, dk, dv, None, None, jnp.zeros_like(out), jnp.zeros_like(lse)


_attach_grad_lse.defvjp(_attach_grad_lse_fwd, _attach_grad_lse_bwd)


# optionally pad Dh up to the 128-lane MXU width inside the kernels
# (2x nominal FLOPs at full rate). MEASURED SLOWER on v5e at dh=64
# (8.9 vs 6.0 ms fwd) — the per-head 64-wide matmuls already pipeline well;
# kept as a sweep knob only (GGT_PAD_DH=128).
_PAD_DH = int(os.environ.get("GGT_PAD_DH", "64"))


def _prep(q, k, v, softmax_scale):
    b, p, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = softmax_scale if softmax_scale is not None else dh**-0.5
    # fold the softmax scale into q outside the kernel: a cheap multiply
    # XLA fuses into the q projection, instead of [BQ,BK] fp32 work per
    # tile inside three kernels. d(qs)/dq = scale is applied by autodiff.
    qs = q * jnp.asarray(scale, q.dtype)
    if dh < _PAD_DH:
        pad = [(0, 0)] * 3 + [(0, _PAD_DH - dh)]
        qs, k, v = jnp.pad(qs, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        dh_k = _PAD_DH
    else:
        dh_k = dh
    return (
        qs.reshape(b, p, h * dh_k),
        k.reshape(b, p, h * dh_k),
        v.reshape(b, p, h * dh_k),
        dh_k,
    )


def flash_attention(
    q: jnp.ndarray,  # [B, P, H, Dh]
    k: jnp.ndarray,  # [B, P, Hkv, Dh]
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [B, P]
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    bi_causal_split: int = 0,
    rope: Optional[tuple] = None,  # (cos, sin) [B, P, Dh]
) -> jnp.ndarray:
    """rope, when given, is applied IN-KERNEL to q/k head tiles (fwd AND
    bwd, with the transpose rotation on dq/dk): the scale fold commutes
    with the rotation, and the VPU rotation work hides under the MXU
    matmuls — vs ~63 ms/step of XLA elementwise passes + [B,P,H,D] layout
    copies when rotating outside (round-5 profile, flagship shape)."""
    from jax.ad_checkpoint import checkpoint_name

    b, p, h, dh = q.shape
    if rope is not None and (_MODE in ("band", "skip") or dh < _PAD_DH):
        # band/skip kernels and the padded-dh layout (rotate_half pairing
        # would mix real and pad lanes) pre-rotate outside instead
        from ..models.rope import apply_rope

        q, k = apply_rope(q, k, rope[0], rope[1])
        rope = None
    qs, kf, vf, dh_k = _prep(q, k, v, softmax_scale)
    if rope is not None:
        rope = (rope[0].astype(qs.dtype), rope[1].astype(qs.dtype))
    bq, bk = _fwd_blocks(p)
    out, lse = _flash_fwd(
        jax.lax.stop_gradient(qs),
        jax.lax.stop_gradient(kf),
        jax.lax.stop_gradient(vf),
        segment_ids, segment_ids, causal, bq, bk, h, dh_k,
        bi_split=bi_causal_split, rope=rope,
    )
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    if rope is None:
        out = _attach_grad(
            qs, kf, vf, segment_ids, segment_ids, out, lse, causal, h, dh_k,
            bi_causal_split,
        )
    else:
        out = _attach_grad_rope(
            qs, kf, vf, segment_ids, segment_ids, out, lse, rope[0], rope[1],
            causal, h, dh_k, bi_causal_split,
        )
    out = out.reshape(b, p, h, dh_k)
    return out[..., :dh] if dh_k != dh else out


def flash_attention_chunk(
    q: jnp.ndarray,  # [B, Pq, H, Dh]
    k: jnp.ndarray,  # [B, Pk, Hkv, Dh]  (Pk == Pq)
    v: jnp.ndarray,
    seg_q: jnp.ndarray,  # [B, Pq]
    seg_k: jnp.ndarray,  # [B, Pk]
    softmax_scale: Optional[float] = None,
    causal: bool = False,
):
    """One ring-attention chunk: q attends the visiting kv block.

    Returns (out, lse) with BOTH outputs differentiable (the ring combine
    out_tot = sum_i exp(lse_i - lse_tot) out_i consumes lse).

    causal=True applies the INTRA-chunk causal mask — correct only when q
    and kv are the same ring chunk (the t=0 ring step); the causal ring
    handles earlier/later chunks as fully-visible/skipped at the ring
    level (parallel/ring_attention.py), so no global-offset plumbing is
    needed in the kernel.
    """
    b, p, h, dh = q.shape
    assert k.shape[1] == p, "ring chunks must be equal-length"
    qs, kf, vf, dh_k = _prep(q, k, v, softmax_scale)
    bq, bk = _fwd_blocks(p)
    out, lse = _flash_fwd(
        jax.lax.stop_gradient(qs),
        jax.lax.stop_gradient(kf),
        jax.lax.stop_gradient(vf),
        seg_q, seg_k, causal, bq, bk, h, dh_k,
    )
    out, lse = _attach_grad_lse(
        qs, kf, vf, seg_q, seg_k, out, lse, causal, h, dh_k
    )
    out = out.reshape(b, p, h, dh_k)
    return (out[..., :dh] if dh_k != dh else out), lse
