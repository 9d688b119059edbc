"""Profiling: jax.profiler traces + per-step wall-clock + MXU-utilization
estimation (the reference has none of this; its only timing is a final
wall-clock print, distributed_trainer_cls.py:173)."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/calm_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 3, iters: int = 10):
    """Median wall-clock of a jitted callable (blocks on the result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50)), out


# Peak bf16 TFLOP/s per chip, for MXU-utilization estimates.
_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,   # v5litepod bf16 peak (394 is the int8 figure)
    "v5p": 459.0,
    "v6e": 918.0,
}


def chip_peak_tflops(default: float = 197.0) -> float:
    kind = jax.devices()[0].device_kind.lower()
    for name, peak in _PEAK_TFLOPS.items():
        if name in kind.replace(" ", ""):
            return peak
    if "v5 lite" in kind or "v5lite" in kind:
        return _PEAK_TFLOPS["v5e"]
    return default


def cost_flops(fn, *args) -> float | None:
    """FLOPs from XLA's cost analysis of the compiled fn, if available."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def mxu_utilization(step_time_s: float, flops_per_step: float) -> float:
    return flops_per_step / step_time_s / (chip_peak_tflops() * 1e12)
