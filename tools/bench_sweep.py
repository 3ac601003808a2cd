"""Perf sweep: step-time breakdown over attention impl / remat / batch.

Usage: python tools/bench_sweep.py [--mode MODE ...]

Each mode reports a one-line JSON with step time and tokens/s. Run on the
real TPU chip. Modes run sequentially in one process (compile cache makes
repeats cheap).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    if jax.default_backend() != "tpu":
        return
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def run(mode: str, batch_size: int, seq: int, n_steps: int = 10):
    import jax

    from __graft_entry__ import _fake_batch, _flagship_cfg
    from graphgpt_tpu.config import OptimizerConfig
    from graphgpt_tpu.models import heads
    from graphgpt_tpu.training import optimizer as opt_lib
    from graphgpt_tpu.training.steps import init_train_state, make_train_step

    cfg = _flagship_cfg(seq=seq)
    # mode: attn=<impl|none>,remat=<policy|off>,fwd
    fwd_only = False
    for part in mode.split(","):
        if part == "attn=none":
            # identity "attention" to isolate the attention share of step time
            from graphgpt_tpu.models import modeling

            modeling.attention = lambda q, k, v, seg, **kw: v
        elif part == "nohead":
            # trivial loss to isolate the lm-head + CE share
            from graphgpt_tpu.models import heads as heads_mod
            from graphgpt_tpu.ops import losses as losses_mod

            losses_mod.chunked_stacked_ce = (
                lambda hidden, *a, **kw: jnp.mean(hidden.astype(jnp.float32) ** 2)
            )
            heads_mod.losses = losses_mod
        elif part.startswith("attn="):
            object.__setattr__(cfg, "attn_impl", part[5:])
        elif part == "remat=off":
            object.__setattr__(cfg, "remat", False)
        elif part.startswith("remat="):
            object.__setattr__(cfg, "remat_policy", part[6:])
        elif part == "fwd":
            fwd_only = True

    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = _fake_batch(batch_size, seq, cfg.stacked_feat, cfg.vocab_size)
    rng = jax.random.PRNGKey(0)

    if fwd_only:
        @jax.jit
        def step_fwd(params, batch):
            return heads.pretrain_forward(params, cfg, batch)["loss"]

        _ = float(step_fwd(params, batch))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            loss = step_fwd(params, batch)
        _ = float(loss)
        dt = time.perf_counter() - t0
    else:
        ocfg = OptimizerConfig(lr=3e-4)
        tx = opt_lib.make_optimizer(ocfg, 1000, 100)
        state = init_train_state(params, tx)
        step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)
        state, m = step(state, batch, rng)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, batch, rng)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0

    step_ms = dt / n_steps * 1e3
    toks = batch_size * seq * n_steps / dt
    print(
        json.dumps(
            {
                "mode": mode,
                "batch": batch_size,
                "seq": seq,
                "step_ms": round(step_ms, 2),
                "tokens_per_s": round(toks, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", action="append", default=[])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    _enable_compile_cache()
    for m in args.mode or ["attn=pallas"]:
        try:
            run(m, args.batch, args.seq, args.steps)
        except Exception as e:  # keep sweeping past OOM/compile failures
            print(json.dumps({"mode": m, "error": repr(e)[:200]}), flush=True)
