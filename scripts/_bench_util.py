"""Shared timing harness for the ad-hoc profilers.

Timing rules discovered for this remote-TPU runtime (see also bench.py):
  * jax.block_until_ready can return BEFORE execution finishes — a pure
    block-based timing of independent dispatches reads ~0 ms.
  * The only trustworthy scheme: a HOST loop of donated jitted calls whose
    outputs feed the next call's (donated) inputs, closed by reading an
    actual VALUE (forces materialization). The ~45 ms client round trip
    amortizes across the chain, so use chains of >= 10 iterations.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _first_leaf(tree):
    return jax.tree.leaves(tree)[0]


def time_chained(step, args, iters: int = 10, reps: int = 3) -> float:
    """step(args) -> args' (same structure, outputs threaded into inputs).
    Returns median seconds/iteration including amortized round trip."""
    jstep = functools.partial(jax.jit, donate_argnums=0)(step)
    a = jax.tree.map(jnp.copy, args)
    a = jstep(a)
    float(jnp.sum(_first_leaf(a)))  # warm compile + materialize
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            a = jstep(a)
        float(jnp.sum(_first_leaf(a)))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.percentile(times, 50))
