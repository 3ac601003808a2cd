"""Capture a jax.profiler trace of the flagship train step and print the
top HLO ops by self time (parsed via tensorboard_plugin_profile).

Usage: python tools/profile_step.py [--batch 64] [--seq 1024] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

# must be set before any protobuf import: the C++ descriptor pool rejects
# the image's stale tensorboard/tsl _pb2 files
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="")
    ap.add_argument("--block", type=int, default=0)
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _fake_batch, _flagship_cfg
    from graphgpt_tpu.config import OptimizerConfig
    from graphgpt_tpu.models import heads
    from graphgpt_tpu.training import optimizer as opt_lib
    from graphgpt_tpu.training.steps import init_train_state, make_train_step

    cfg = _flagship_cfg(seq=args.seq, attn_block=args.block)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=3e-4)
    tx = opt_lib.make_optimizer(ocfg, 1000, 100)
    state = init_train_state(params, tx)
    step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)
    batch = _fake_batch(
        args.batch, args.seq, cfg.stacked_feat, cfg.vocab_size, block=args.block
    )
    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch, rng)
    _ = float(m["loss"])  # compile + settle

    logdir = args.logdir or tempfile.mkdtemp(prefix="ggt_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        _ = float(m["loss"])

    # ---- parse the xplane with the tensorboard profile plugin
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured", "logdir": logdir}))
        return
    print(f"# logdir: {logdir}")
    try:
        _parse_raw_xplane(xplanes[0], args.top, args.steps)
        return
    except Exception as e:  # pragma: no cover - fallback path
        print(f"# raw parse failed ({e}); trying the tensorboard plugin")
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    # hlo_stats tool: list-of-rows table; find columns
    rows = obj if isinstance(obj, list) else obj.get("data", [])
    print(f"# logdir: {logdir}")
    _print_hlo_table(rows, args.top)


def _parse_raw_xplane(path: str, top: int, steps: int):
    """Self-time sweep over the device 'XLA Ops' line of a raw xplane proto
    (no tensorboard plugin needed; its protobuf bindings are broken in this
    image). Parents sort before children at equal start so the containment
    stack attributes nested time correctly."""
    import collections

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = [p for p in xs.planes if "TPU" in p.name][0]
    evm = plane.event_metadata
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    evs = sorted(
        (ev.offset_ps, -ev.duration_ps, evm[ev.metadata_id].name)
        for ev in line.events
    )
    self_time: collections.Counter = collections.Counter()
    count: collections.Counter = collections.Counter()
    stack = []
    for s, nd, name in evs:
        e = s - nd
        while stack and stack[-1][1] <= s:
            stack.pop()
        if stack:
            pe = stack[-1][1]
            self_time[stack[-1][2]] -= (e - s) if e <= pe else (pe - s)
        self_time[name] += e - s
        count[name] += 1
        stack.append((s, e, name))
    total = sum(self_time.values())
    print(f"total self {total / 1e9 / steps:.1f} ms/step")
    for name, ps in self_time.most_common(top):
        print(
            f"{ps / 1e9 / steps:8.2f} ms/step {100 * ps / total:5.1f}% "
            f"x{count[name] // steps:<4d} {name[:140]}"
        )


def _print_hlo_table(rows, top):
    # rows[0] may be a header; normalise to dicts
    if rows and isinstance(rows[0], dict) and "p" in rows[0]:
        rows = [r["p"] for r in rows]
    if not rows:
        print(json.dumps(rows)[:2000])
        return
    if isinstance(rows[0], list):  # header + data lists
        header, data = rows[0], rows[1:]
    else:
        header, data = list(rows[0].keys()), [list(r.values()) for r in rows]
    print("\t".join(map(str, header)))
    for r in data[:top]:
        print("\t".join(str(x)[:70] for x in r))


if __name__ == "__main__":
    main()
