"""Pipeline introspection (reference inspect_tokenization_results,
src/utils/inspection_utils.py:73-143): print the full tokenize -> pack ->
ids -> task-inputs chain for one sample, plus token-length percentiles."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .logging import log_line


def inspect_tokenization(dataset, tokenizer, n_stats: int = 256, seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    g = dataset[0]
    sample = tokenizer(g, rng)
    log_line("=== tokenization inspection ===")
    log_line(f"graph: num_nodes={g.num_nodes} num_edges={g.num_edges}")
    log_line(f"input_ids shape: {sample.input_ids.shape} dtype {sample.input_ids.dtype}")
    head = sample.input_ids[:6]
    log_line(f"first rows:\n{head}")
    log_line(f"labels head:\n{sample.labels[:6]}")
    log_line(f"position_ids head: {sample.position_ids[:12].tolist()}")
    if sample.wgt is not None:
        log_line(f"dLM wgt: {sample.wgt:.3f}")
    lens = []
    for i in rng.choice(len(dataset), size=min(n_stats, len(dataset)), replace=False):
        lens.append(tokenizer(dataset[int(i)], rng).seq_len)
    lens = np.asarray(lens)
    pct = np.percentile(lens, [50, 90, 99, 100]).astype(int)
    log_line(
        f"token length over {len(lens)} samples: mean {lens.mean():.1f}, "
        f"p50/p90/p99/max = {pct.tolist()}"
    )
    return {"mean_len": float(lens.mean()), "p99_len": int(pct[2]), "max_len": int(pct[3])}


def profile_trace(output_dir: str, steps_fn, num_steps: int = 5) -> Optional[str]:
    """Capture a jax.profiler trace around `steps_fn(num_steps)` (the
    TPU-native replacement for the reference's DeepSpeed FlopsProfiler,
    SURVEY.md §5.1)."""
    import jax

    trace_dir = f"{output_dir}/trace"
    try:
        with jax.profiler.trace(trace_dir):
            steps_fn(num_steps)
        log_line(f"profiler trace written to {trace_dir}")
        return trace_dir
    except Exception as e:  # profiling must never kill training
        log_line(f"profiler trace failed: {e}")
        return None
