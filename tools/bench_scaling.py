"""Multi-host throughput scaling harness (1 chip / 1 host / N hosts).

The BASELINE target ("tokens/s at 1 chip, 1 host, N>=2 hosts; >=90% linear
scaling to >=2 hosts") has no reference counterpart — this is our harness.
On real multi-host TPU slices run it with the default platform; on this
single-chip box it validates the harness itself over jax.distributed with
virtual CPU devices per process (numbers are then CPU numbers — the point
is that the same code path runs under real XLA collectives).

    python tools/bench_scaling.py --hosts 1 --hosts 2 [--quick]

Prints one JSON line per configuration:
    {"hosts": N, "global_tokens_per_s": ..., "scaling_efficiency": ...}
(scaling_efficiency is vs the 1-host run of the same invocation).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
import numpy as np

force_cpu = os.environ.get("GGT_SCALING_CPU", "1") == "1"
if force_cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if force_cpu:
    jax.config.update("jax_platforms", "cpu")

from graphgpt_tpu.parallel import mesh as mesh_lib

coord, pid, nproc, quick = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4] == "1"
)
if nproc > 1:
    mesh_lib.initialize_multihost(coordinator=coord, num_processes=nproc, process_id=pid)

from __graft_entry__ import _fake_batch, _flagship_cfg
from graphgpt_tpu.config import MeshConfig, OptimizerConfig
from graphgpt_tpu.models import heads
from graphgpt_tpu.training import optimizer as opt_lib
from graphgpt_tpu.training.steps import init_train_state, make_train_step

if quick or jax.default_backend() != "tpu":
    cfg = _flagship_cfg(hidden=128, layers=2, seq=128)
    cfg.dtype = "float32" if jax.default_backend() != "tpu" else "bfloat16"
    per_host_batch, n_steps = 4, 8
else:
    cfg = _flagship_cfg()
    per_host_batch, n_steps = 64, 10

mesh = mesh_lib.make_mesh(MeshConfig())  # all global devices on `data`
params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
shardings = mesh_lib.named_sharding_tree(mesh, mesh_lib.param_pspecs(params))
params = jax.device_put(params, shardings)
ocfg = OptimizerConfig(lr=3e-4)
tx = opt_lib.make_optimizer(ocfg, 1000, 100)
state = jax.jit(lambda p: init_train_state(p, tx))(params)
step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)

p = cfg.max_position_embeddings
host_batch = {
    k: np.asarray(v)
    for k, v in _fake_batch(per_host_batch, p, cfg.stacked_feat, cfg.vocab_size).items()
}
batch = mesh_lib.shard_batch(mesh, host_batch)
rng = jax.random.PRNGKey(0)
with mesh:
    state, m = step(state, batch, rng)  # compile
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch, rng)
    _ = float(m["loss"])
dt = time.perf_counter() - t0
global_tokens = per_host_batch * nproc * p * n_steps
if jax.process_index() == 0:
    print(json.dumps({
        "hosts": nproc,
        "devices": jax.device_count(),
        "global_tokens_per_s": round(global_tokens / dt, 1),
        "step_ms": round(dt / n_steps * 1e3, 2),
    }), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_hosts(n: int, quick: bool, devices_per_host: int, force_cpu: bool) -> dict:
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["GGT_SCALING_CPU"] = "1" if force_cpu else "0"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_host}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i), str(n), "1" if quick else "0"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=_HERE,
        )
        for i in range(n)
    ]
    result = None
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-2000:])
        for line in out.decode().splitlines():
            if line.startswith("{"):
                result = json.loads(line)
    assert result is not None, "no result line from process 0"
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, action="append", default=[])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--devices-per-host", type=int, default=2)
    ap.add_argument(
        "--tpu", action="store_true",
        help="use the default (TPU) platform per process instead of virtual CPU",
    )
    args = ap.parse_args()
    hosts = args.hosts or [1, 2]
    base = None
    for n in sorted(hosts):
        r = run_hosts(n, args.quick, args.devices_per_host, force_cpu=not args.tpu)
        if base is None:
            base = (r["hosts"], r["global_tokens_per_s"])
        r["scaling_efficiency"] = round(
            (r["global_tokens_per_s"] / r["hosts"]) / (base[1] / base[0]), 4
        )
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
