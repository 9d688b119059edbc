"""Toolchain canaries for the layouts the round-3/4 perf work is blocked
on (VERDICT r3 item 9).

Two structural optimizations were measured as NET LOSSES on the current
Mosaic/XLA toolchain and deliberately NOT adopted (NOTES.md "Roofline
accounting" — projections and transposes buckets):

  swap    in-kernel (s,h)->(h,s) VMEM relayout — the primitive that would
          let the attention kernels consume the projection-natural
          (b,s,h,d) layout and delete ~15 ms/step of backward transposes.
          r2: crashed Mosaic. r3/r4: compiles, correct, but SLOWER than
          XLA's HBM transpose (3.99 vs 2.94 ms at the flagship shape).
  proj    head-split projection emitted as one einsum into (b,h,s,d)
          instead of merged-dot + split + transpose. Standalone the
          einsum wins ~13%; the in-step TRAINING A/B loses 1.2% (XLA
          fuses the baseline backward better), so training keeps the
          merged dot (eval adopted the einsum — commit 9931ec8).

This script re-measures both standalone probes (~1 min warm) and compares
against the committed baselines in docs/evidence/canary_baselines.json.
If a blocked layout FLIPS (the loser now wins standalone by more than the
recorded margin drift), it prints OPPORTUNITY with the exact follow-up:
the in-model env-flag A/B that decides adoption. Run it after any
jax/libtpu/Mosaic upgrade:

    python scripts/canary_probes.py            # compare vs baselines
    python scripts/canary_probes.py --rebaseline  # rewrite baselines
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINES = ROOT / "docs" / "evidence" / "canary_baselines.json"


def probe_swap(b=128, h=12, s=224, d=56) -> dict:
    """In-VMEM (tq,h,d)->(h,tq,d) relayout vs XLA HBM transpose.
    Blocked while pallas_ms >= xla_ms (mosaic_swap_probe.py, r3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)

    call = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, h, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))

    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, s, h, d)),
                    jnp.bfloat16)

    def timed(f):
        y = f(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(10):
            y = f(x)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / 10 * 1e3

    try:
        jp = jax.jit(call)
        ok = bool(jnp.all(jp(x) == jnp.swapaxes(x, 1, 2)))
        jx = jax.jit(lambda a: jnp.swapaxes(a, 1, 2))
        # Interleave and take mins — this remote runtime's run-to-run
        # drift would otherwise dwarf the ~1.4x margin under test.
        pallas_ms = min(timed(jp) for _ in range(3))
        xla_ms = min(timed(jx) for _ in range(3))
    except Exception as e:  # Mosaic crash = still blocked, loudly
        return {"status": "crash", "error": f"{type(e).__name__}: "
                                            f"{str(e)[:200]}"}
    return {"status": "ok" if ok else "incorrect",
            "pallas_ms": round(pallas_ms, 3), "xla_ms": round(xla_ms, 3),
            "blocked": pallas_ms >= xla_ms}


def probe_proj(b=128, s=224, dim=672, h=12) -> dict:
    """Head-split projection: merged-dot+transpose vs direct einsum,
    fwd+bwd. The TRAINING in-step A/B is the decider; this standalone
    ratio is the cheap drift detector (r4 reading: einsum ~13% faster
    standalone yet 1.2% slower in-step)."""
    from _bench_util import time_chained

    d = dim // h
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, dim)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3 * dim, dim)) * 0.05,
                    jnp.bfloat16)

    def split_baseline(x, w):
        y = jnp.dot(x, w.T, preferred_element_type=jnp.bfloat16)
        return tuple(q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                     for q in jnp.split(y, 3, axis=-1))

    def split_einsum(x, w):
        wh = w.reshape(3, h, d, dim)
        return tuple(jnp.einsum("bsk,hdk->bhsd", x, wh[i],
                                preferred_element_type=jnp.bfloat16)
                     for i in range(3))

    def timed(f):
        def loss(x, w):
            q, k, v = f(x, w)
            return (jnp.sum(q.astype(jnp.float32) ** 2)
                    + jnp.sum(k.astype(jnp.float32) ** 2)
                    + jnp.sum(v.astype(jnp.float32) ** 2))

        g = jax.grad(loss, argnums=(0, 1))

        def step(a):
            gx, gw = g(*a)
            return (a[0] + 1e-6 * gx.astype(a[0].dtype),
                    a[1] + 1e-6 * gw.astype(a[1].dtype))

        return time_chained(step, (x, w), iters=20) * 1e3

    # Alternate the two variants and keep per-variant minima: single
    # readings drift +-13% run-to-run here, which would false-flag the
    # 10% decision threshold.
    base_ms = min(timed(split_baseline) for _ in range(3))
    eins_ms = min(timed(split_einsum) for _ in range(3))
    return {"status": "ok", "baseline_ms": round(base_ms, 3),
            "einsum_ms": round(eins_ms, 3),
            "einsum_speedup": round(base_ms / eins_ms, 3)}


FOLLOWUP = {
    "swap": ("in-VMEM relayout now beats the XLA transpose — rebuild the "
             "attention dispatch to consume (b,s,h,d) directly "
             "(kernels/axial_attention.py) and re-run bench.py; "
             "~15 ms/step of backward transposes are on the table."),
    "proj": ("standalone einsum advantage moved by >10% — re-run the "
             "in-step training A/B: CALM_PROJ_IMPL=einsum python bench.py "
             "vs CALM_PROJ_IMPL=split python bench.py; adopt for training "
             "if it now wins (eval already uses the einsum)."),
}


def run_canaries() -> tuple[dict, list]:
    """Measure both probes and diff against the committed baselines.

    Returns (results, flips) where flips is [(name, follow-up text), ...].
    Called by bench.py so the driver-recorded BENCH_r*.json surfaces a
    toolchain upgrade that re-opens a parked optimization (VERDICT r4
    weak #3)."""
    results = {"swap": probe_swap(), "proj": probe_proj(),
               "jax": jax.__version__}
    flips = []
    if BASELINES.exists():
        base = json.loads(BASELINES.read_text())
        sw = results["swap"]
        if sw["status"] == "ok" and not sw["blocked"]:
            flips.append(("swap", FOLLOWUP["swap"]))
        pr, pb = results["proj"], base.get("proj", {})
        if pr["status"] == "ok" and pb.get("einsum_speedup") and abs(
                pr["einsum_speedup"] - pb["einsum_speedup"]) \
                > 0.10 * pb["einsum_speedup"]:
            flips.append(("proj", FOLLOWUP["proj"]))
    return results, flips


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebaseline", action="store_true")
    args = ap.parse_args()

    if args.rebaseline or not BASELINES.exists():
        results = {"swap": probe_swap(), "proj": probe_proj(),
                   "jax": jax.__version__}
        print(json.dumps(results, indent=1))
        BASELINES.parent.mkdir(parents=True, exist_ok=True)
        BASELINES.write_text(json.dumps(results, indent=1) + "\n")
        print(f"baselines written to {BASELINES}")
        return

    results, flips = run_canaries()
    print(json.dumps(results, indent=1))
    base = json.loads(BASELINES.read_text())
    if not flips:
        sw, pr = results["swap"], results["proj"]
        pb = base.get("proj", {})
        print("\nCANARY: no change — both layouts remain blocked on this "
              "toolchain (swap: pallas "
              f"{sw.get('pallas_ms')} vs xla {sw.get('xla_ms')} ms; "
              f"proj standalone speedup {pr.get('einsum_speedup')} vs "
              f"baseline {pb.get('einsum_speedup')}).")
    for name, todo in flips:
        print(f"\nCANARY OPPORTUNITY [{name}]: {todo}")


if __name__ == "__main__":
    main()
