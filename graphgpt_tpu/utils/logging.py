"""CSV + stdout training logs (reference: rank-0 log.csv / result.csv
appends, src/utils/misc_utils.py:124-175)."""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class CsvLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fieldnames = None

    def log(self, row: Dict):
        write_header = self._fieldnames is None and not os.path.exists(self.path)
        if self._fieldnames is None:
            if os.path.exists(self.path):
                with open(self.path) as f:
                    reader = csv.reader(f)
                    self._fieldnames = next(reader, None)
            if self._fieldnames is None:
                self._fieldnames = list(row.keys())
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow(row)


class Throughput:
    """Tokens/s + samples/s between logging intervals (reference
    TrainingStats.cal_speed, src/conf/stats_configs.py:69-76)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.tokens = 0
        self.samples = 0

    def update(self, tokens: int, samples: int):
        self.tokens += tokens
        self.samples += samples

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "tokens_per_s": self.tokens / dt,
            "samples_per_s": self.samples / dt,
        }


def log_line(msg: str):
    print(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}", flush=True)


# ---------------------------------------------------------------------------
# Analytic FLOPs accounting (replaces the reference's DeepSpeed FlopsProfiler
# log.csv columns, src/utils/log_eval_dump_utils.py:525-531, with a
# closed-form transformer estimate: 6*N per token fwd+bwd plus attention
# 12*L*P*H*Dh, halved under causal masking)
# ---------------------------------------------------------------------------
def train_flops_per_token(
    n_params: int,
    seq_len: int,
    num_layers: int,
    num_heads: int,
    head_dim: int,
    causal: bool = False,
) -> float:
    attn = 12.0 * num_layers * seq_len * num_heads * head_dim
    if causal:
        attn *= 0.5
    return 6.0 * float(n_params) + attn


def peak_flops_per_chip() -> float:
    """bf16 peak for the attached chip generation (0 off-TPU)."""
    import jax

    if jax.default_backend() != "tpu":
        return 0.0
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind or "v5 pod" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind:
        return 918e12
    return 197e12
