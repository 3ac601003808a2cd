"""Ring attention over an ICI mesh axis (sequence parallelism).

The BASELINE north-star stretch (SURVEY §5.7): the reference has NO
sequence/context parallelism — sequence length is handled single-device
via token packing. Here sequences beyond one chip's memory/attention
budget are sharded over a `seq` mesh axis: every device keeps its q
shard, while k/v (+ their segment ids) rotate around the ring via
`jax.lax.ppermute` (riding ICI); partial attention outputs are combined
with a running online-softmax (log-sum-exp) merge, so no device ever
sees more than one [Pl, Pl] block of work at a time.

Differentiability comes for free: each ring step calls a chunk kernel
whose custom VJP also carries the lse cotangent
(ops/flash_attention.flash_attention_chunk), the ppermute rotations and
the merge are plain differentiable jax, and the step loop is a lax.scan.

Supports bidirectional + segment-id masking (the flagship pretrain
setting) AND causal masking (NTP pretrain): under causality, ring step t
on device i holds the kv chunk originally at ring position (i - t) mod n,
which is either this device's own chunk (t=0: intra-chunk causal mask),
an earlier chunk (fully visible, bidirectional segment mask), or a later
chunk (fully masked — the chunk computation is skipped with lax.cond, so
causal ring does ~half the chunk work, like a causal kernel should).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def xla_chunk_with_lse(q, k, v, seg_q, seg_k, softmax_scale=None, causal=False):
    """Plain-XLA (out, lse) chunk — natively differentiable; used off-TPU
    and as the numerics oracle for the Pallas chunk kernel. causal=True is
    only meaningful when q and kv are the SAME ring chunk (local indices
    equal global-offset differences)."""
    b, p, h, dh = q.shape
    scale = softmax_scale if softmax_scale is not None else dh**-0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    valid = (seg_q[:, None, :, None] == seg_k[:, None, None, :]) & (
        seg_k[:, None, None, :] > 0
    )
    if causal:
        idx = jnp.arange(p)
        valid = valid & (idx[None, None, :, None] >= idx[None, None, None, :])
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, H, Pq]
    p_ = jnp.exp(s - m[..., None])
    l = jnp.sum(p_, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", p_.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    row_valid = (seg_q > 0)[:, :, None, None]
    out = jnp.where(
        row_valid, out / jnp.swapaxes(l, 1, 2)[..., None], 0.0
    ).astype(q.dtype)
    lse = jnp.where(m <= _NEG_INF, _NEG_INF, m + jnp.log(l))
    return out, lse


def _chunk(q, k, v, seg_q, seg_k, softmax_scale, use_pallas: bool, causal=False):
    if use_pallas:
        from ..ops.flash_attention import flash_attention_chunk

        return flash_attention_chunk(
            q, k, v, seg_q, seg_k, softmax_scale, causal=causal
        )
    return xla_chunk_with_lse(q, k, v, seg_q, seg_k, softmax_scale, causal=causal)


def ring_attention(
    q: jnp.ndarray,  # [B, Pl, H, Dh] — THIS device's shard
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [B, Pl]
    axis_name: str,
    axis_size: int,
    softmax_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """shard_map body: segment attention of the local q shard against the
    WHOLE (ring-distributed) sequence, bidirectional or causal."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    b, pl_, h, dh = q.shape
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    iq = jax.lax.axis_index(axis_name)

    def step(carry, t):
        kc, vc, segc, acc, m, l = carry
        if not causal:
            out_i, lse_i = _chunk(
                q, kc, vc, segment_ids, segc, softmax_scale, use_pallas
            )
        else:
            # ring step t holds the kv chunk from position (iq - t) mod n:
            # own chunk (t=0, intra-chunk causal), an earlier chunk (fully
            # visible), or a later chunk (fully masked -> skipped)
            def own(_):
                return _chunk(
                    q, kc, vc, segment_ids, segc, softmax_scale, use_pallas,
                    causal=True,
                )

            def earlier_or_skip(_):
                def earlier(_):
                    return _chunk(
                        q, kc, vc, segment_ids, segc, softmax_scale, use_pallas
                    )

                def skip(_):
                    # derive from q so the outputs carry the same device-
                    # varying vma type as the chunk kernel's (plain
                    # constants are unvarying and fail shard_map's check)
                    zero_lse = (
                        jnp.swapaxes(q[..., 0].astype(jnp.float32), 1, 2) * 0.0
                    )
                    return jnp.zeros_like(q), zero_lse + _NEG_INF

                return jax.lax.cond(t <= iq, earlier, skip, None)

            out_i, lse_i = jax.lax.cond(t == 0, own, earlier_or_skip, None)
        # running log-sum-exp merge across ring steps (all fp32)
        m_new = jnp.maximum(m, lse_i)  # [B, H, Pl]
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(lse_i - m_new)
        w = jnp.swapaxes(beta, 1, 2)[..., None]  # [B, Pl, H, 1]
        a = jnp.swapaxes(alpha, 1, 2)[..., None]
        acc = acc * a + out_i.astype(jnp.float32) * w
        l = l * alpha + beta
        # rotate the kv block (and its segment ids) to the next device
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        segc = jax.lax.ppermute(segc, axis_name, perm)
        return (kc, vc, segc, acc, m_new, l), None

    # initial accumulators derived from q so they carry the same
    # device-varying manual-axes type as the loop body's outputs (plain
    # zeros constants are unvarying and trip shard_map's scan vma check)
    acc0 = q.astype(jnp.float32) * 0.0
    zero_bhp = jnp.swapaxes(q[..., 0].astype(jnp.float32), 1, 2) * 0.0
    m0 = zero_bhp + _NEG_INF
    l0 = zero_bhp
    (kc, vc, segc, acc, m, l), _ = jax.lax.scan(
        step, (k, v, segment_ids, acc0, m0, l0), jnp.arange(axis_size)
    )
    lsafe = jnp.where(l == 0.0, 1.0, l)
    out = acc / jnp.swapaxes(lsafe, 1, 2)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,  # [B, P, H, Dh] — GLOBAL arrays
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,  # [B, P]
    mesh,
    axis: str = "seq",
    softmax_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """shard_map wrapper: shard the sequence axis over `axis`, run the ring.

    Batch stays sharded over (data, fsdp) as usual; heads replicated over
    `tensor` here (tensor-parallel attention splits heads BEFORE this
    call, in which case each tp shard rings its own heads).
    """
    n = mesh.shape[axis]
    if n == 1:
        from ..ops.attention import xla_attention

        return xla_attention(
            q, k, v, segment_ids, causal=causal, softmax_scale=softmax_scale
        )
    if use_pallas is None:
        # decide by the MESH devices, not the process default backend: under
        # the axon tunnel the default backend is the (single) TPU even when
        # the dryrun mesh is virtual CPU devices
        use_pallas = mesh.devices.flat[0].platform == "tpu"
    body = functools.partial(
        ring_attention,
        axis_name=axis,
        axis_size=n,
        softmax_scale=softmax_scale,
        use_pallas=use_pallas,
        causal=causal,
    )
    batch = ("data", "fsdp")
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(batch, axis, None, None),
            P(batch, axis, None, None),
            P(batch, axis, None, None),
            P(batch, axis),
        ),
        out_specs=P(batch, axis, None, None),
    )(q, k, v, segment_ids)
