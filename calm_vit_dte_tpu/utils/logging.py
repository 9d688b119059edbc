"""Metrics logging + per-step timing.

The reference's observability is rank-0 print() every 100 batches
(reference: distributed_trainer_cls.py:103-104). Kept (same cadence, process
0 only), plus structured JSONL metrics and wall-clock step timing with p50
tracking — the driver's headline metric is images/sec/chip and p50 step time.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def is_chief() -> bool:
    return jax.process_index() == 0


class MetricLogger:
    def __init__(self, log_every: int = 100, jsonl_path: str | None = None):
        self.log_every = log_every
        self.jsonl_path = jsonl_path
        self.step_times: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.step_times.append(now - self._last)
        self._last = now

    def p50_step_time(self) -> float | None:
        if not self.step_times:
            return None
        return float(np.percentile(self.step_times, 50))

    def log(self, epoch: int, step: int, metrics: dict) -> None:
        if not is_chief() or step % self.log_every != 0:
            return
        vals = {k: float(v) for k, v in metrics.items()
                if np.ndim(v) == 0}
        msg = ", ".join(f"{k}: {v:.6g}" for k, v in vals.items())
        print(f"Epoch: {epoch + 1}, Batch: {step + 1}, {msg}", flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, "step": step, **vals})
                        + "\n")
