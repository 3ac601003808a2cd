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
