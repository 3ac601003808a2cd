"""AOT-compile the flagship train step and report layout/lowering smells.

Greps the optimized HLO for (a) matmuls lowered as `convolution`, (b)
layout-flip `copy` ops on big tensors, (c) fp32 [B,P,D]-sized tensors in
the backward — the failure modes that cost ~20% of a step on v5e (see
PERF.md).  Much faster than a full profile: one remote compile, no run.

Usage: python tools/inspect_hlo.py [--batch 64] [--seq 1024] [--dump FILE]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--dump", default="")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _fake_batch, _flagship_cfg
    from graphgpt_tpu.config import OptimizerConfig
    from graphgpt_tpu.models import heads
    from graphgpt_tpu.training import optimizer as opt_lib
    from graphgpt_tpu.training.steps import init_train_state, make_train_step

    cfg = _flagship_cfg(seq=args.seq)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=3e-4)
    tx = opt_lib.make_optimizer(ocfg, 1000, 100)
    state = init_train_state(params, tx)
    step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)
    batch = _fake_batch(args.batch, args.seq, cfg.stacked_feat, cfg.vocab_size)
    rng = jax.random.PRNGKey(0)
    compiled = jax.jit(step).lower(state, batch, rng).compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"# dumped {len(txt)} chars to {args.dump}")
    report(txt)


def report(txt: str):
    convs = [l for l in txt.splitlines() if re.search(r"=\s+\S+ convolution\(", l)]
    print(f"convolution ops: {len(convs)}")
    for l in convs[:10]:
        print("  " + l.strip()[:160])
    # layout-flip copies on >=64MB tensors
    copies = []
    for l in txt.splitlines():
        m = re.match(r"\s*%?\S+ = (\w+)\[([\d,]+)\]\{([\d,]+)[^}]*\} copy\(", l)
        if not m:
            continue
        dt, shape, lay = m.groups()
        n = 1
        for s in shape.split(","):
            n *= int(s)
        bytes_ = n * (4 if dt in ("f32", "s32", "u32") else 2)
        if bytes_ >= 64 * 1024 * 1024:
            copies.append((bytes_, l.strip()[:160]))
    copies.sort(reverse=True)
    print(f"big copies (>=64MB): {len(copies)}")
    for b, l in copies[:12]:
        print(f"  {b / 1e6:7.0f}MB {l}")
    # histogram of big-tensor fusion outputs by (dtype, layout)
    hist = collections.Counter()
    for m in re.finditer(r"= (f32|bf16)\[([\d,]+)\]\{([\d,]+)", txt):
        dt, shape, lay = m.groups()
        n = 1
        for s in shape.split(","):
            n *= int(s)
        if n >= 64 * 1024 * 1024 // 2:
            hist[(dt, shape, lay)] += 1
    print("big tensors by (dtype, shape, layout):")
    for (dt, shape, lay), c in hist.most_common(12):
        print(f"  x{c:<4d} {dt}[{shape}]{{{lay}}}")


if __name__ == "__main__":
    main()
