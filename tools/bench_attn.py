"""Attention kernel micro-benchmark at the flagship shape.

Compares our segment-id flash attention (ops/flash_attention.py) against
jax's bundled TPU kernels (splash attention) and a plain XLA softmax
attention, fwd and fwd+bwd, including any layout transposes each impl
needs from our native [B, P, H*Dh] activations.

Usage: python tools/bench_attn.py [--batch 64] [--seq 1024] [--heads 12]
       [--dh 64] [--iters 20] [--causal]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_sweep import _enable_compile_cache  # noqa: E402


def _time(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--impl", action="append", default=[])
    ap.add_argument(
        "--packed",
        type=int,
        default=0,
        help="mean packed-segment length (0 = one dense segment per row); "
        "the flagship PCQM4M-v2 SMTP workload packs ~32-token segments",
    )
    args = ap.parse_args()
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from graphgpt_tpu.ops.flash_attention import flash_attention

    b, p, h, dh = args.batch, args.seq, args.heads, args.dh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.bfloat16)
    if args.packed > 0:
        segs = np.zeros((b, p), np.int32)
        for r in range(b):
            pos, sid = 0, 1
            while pos < p:
                ln = min(int(rng.integers(args.packed // 2, args.packed * 2)), p - pos)
                segs[r, pos : pos + ln] = sid
                pos += ln
                sid += 1
        seg = jnp.asarray(segs)
    else:
        seg = jnp.ones((b, p), jnp.int32)
    causal = args.causal

    impls = {}

    def ours(q, k, v):
        return flash_attention(q, k, v, seg, causal=causal)

    impls["ours"] = ours

    def xla(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh**-0.5)
        pm = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", pm, v)

    impls["xla"] = xla

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
        )
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_mask as sm,
        )

        if causal:
            mask = sm.CausalMask((p, p))
        else:
            mask = sm.FullMask((p, p))
        mmask = sm.MultiHeadMask([mask] * h)
        kernel = sk.make_splash_mha(
            mask=mmask,
            head_shards=1,
            q_seq_shards=1,
        )
        vkernel = jax.vmap(kernel)

        def splash(q, k, v):
            # splash wants [B, H, P, D] and pre-scaled q
            qs = (q * (dh**-0.5)).swapaxes(1, 2)
            return vkernel(qs, k.swapaxes(1, 2), v.swapaxes(1, 2)).swapaxes(1, 2)

        impls["splash"] = splash
    except Exception as e:
        print("splash unavailable:", repr(e)[:120])

    want = args.impl or list(impls)
    for name in want:
        fn = impls.get(name)
        if fn is None:
            continue
        try:
            fwd = jax.jit(fn)
            t_fwd = _time(fwd, (q, k, v), args.iters)

            def loss(q, k, v):
                return (fn(q, k, v).astype(jnp.float32) ** 2).sum()

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t_fb = _time(fb, (q, k, v), args.iters)
            print(
                f"{name:8s} fwd {t_fwd:7.2f} ms   fwd+bwd {t_fb:7.2f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"{name:8s} FAILED: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
