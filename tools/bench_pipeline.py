"""Full-pipeline throughput bench: the REAL pretrain path end to end.

Unlike the synthetic device-only loop in bench.py (one resident batch,
no input pipeline), this drives PretrainPipeline's actual machinery —
process-pool tokenization, packing, per-step host->device transfer with
double-buffering, jitted train step — on the flagship config and reports
steady-state tokens/s. Invoked as `python bench.py --pipeline`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def run_pipeline_bench(args, peak_flops: float):
    import jax

    from graphgpt_tpu.config import Config
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config()
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    if args.quick or not on_tpu:
        cfg.model.hidden_size = 128
        cfg.model.num_hidden_layers = 2
        cfg.training.batch_size = args.batch or 8
        cfg.training.max_length = min(args.seq, 256)
        n_steps = args.steps or 6
        warm_steps = 2
    else:
        cfg.model.hidden_size = 768
        cfg.model.num_hidden_layers = 12
        cfg.model.remat = True
        cfg.model.remat_policy = "save_attn"
        cfg.training.batch_size = args.batch or 64
        cfg.training.max_length = args.seq
        n_steps = args.steps or 40
        warm_steps = 6
    cfg.model.dtype = "bfloat16" if on_tpu else "float32"
    cfg.training.task_type = "pretrain-mlm"
    cfg.training.pack_tokens = 1
    cfg.training.num_workers = 8
    cfg.training.do_valid = False
    cfg.training.schedule.total_num_steps = n_steps + warm_steps
    cfg.training.schedule.warmup_num_steps = 2
    cfg.training.schedule.logging_steps = 10**9  # no mid-run readbacks
    cfg.training.schedule.steps_per_saving = 0
    cfg.training.output_dir = os.environ.get(
        "GGT_BENCH_DIR", "/tmp/ggt_bench_pipeline"
    )
    import shutil

    shutil.rmtree(cfg.training.output_dir, ignore_errors=True)

    pipe = PretrainPipeline(cfg).setup()
    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(pipe.state.params)
    )
    from graphgpt_tpu.utils.logging import train_flops_per_token

    mc = pipe.cfg.model
    sol = peak_flops / train_flops_per_token(
        n_params,
        cfg.training.max_length,
        mc.num_hidden_layers,
        mc.num_attention_heads,
        mc.head_dim,
        causal=mc.causal_attention,
    )
    rng = jax.random.PRNGKey(0)
    seq = cfg.training.max_length

    tokens = 0
    step_i = 0
    t0 = None
    with pipe.mesh:
        for epoch in range(1000):
            for batch in pipe._device_prefetch(pipe._device_batches(epoch)):
                n_tok = batch.pop("_host_token_count", 0)
                pipe.state, metrics = pipe.train_step(pipe.state, batch, rng)
                step_i += 1
                if step_i == warm_steps:
                    _ = float(metrics["loss"])  # sync, then start the clock
                    t0 = time.perf_counter()
                    tokens = 0
                elif t0 is not None:
                    tokens += n_tok
                if step_i >= warm_steps + n_steps:
                    break
            if step_i >= warm_steps + n_steps:
                break
        _ = float(metrics["loss"])  # final sync
    dt = time.perf_counter() - t0
    pipe.loader.close()
    tokens_per_s = tokens / dt
    print(
        json.dumps(
            {
                "metric": "pipeline_tokens_per_sec_per_chip",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_s / sol, 4),
            }
        ),
        flush=True,
    )
