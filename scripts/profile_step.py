"""Capture a jax.profiler trace of the production train step and print a
per-op device-time breakdown.

This is the tool behind the step-budget numbers in NOTES.md: it runs N
traced steps of the full jitted train step (flagship config by default),
parses the xplane protobuf with the installed xprof converter, and
aggregates HLO self-times by framework op path — so "where do the
milliseconds go" is answerable without guessing from op names.

Usage:
    python scripts/profile_step.py [--config imagenet-cls-224]
        [--batch 128] [--steps 3] [--task cls] [--top 30]

Output: total ms/step, XLA-remat duplicate time (silent rematerialization
under memory pressure shows up here), and the top aggregated buckets
(pallas kernels, dot_generals, transposes, ...).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def capture(config: str, batch_size: int, steps: int, task: str,
            trace_dir: str) -> None:
    from calm_vit_dte_tpu.data.pipeline import (
        make_cls_preprocess, make_reg_preprocess,
    )
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config(config)
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        cfg.epochs, steps_per_epoch=1000)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.integers(
        0, 256, (batch_size, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8))}
    if task == "cls":
        batch["label"] = jnp.asarray(rng.integers(
            0, cfg.model.out_features, (batch_size,), dtype=np.int32))
        pre = make_cls_preprocess(cfg.model.out_features, cfg.crop)
    else:
        pre = make_reg_preprocess(cfg.crop)
    step = make_train_step(cfg.model, tx, task, dtype=jnp.bfloat16,
                           remat=False, preprocess=pre)
    js = jax.jit(step, donate_argnums=0)
    state, m = js(state, batch)
    jax.block_until_ready(state.params)
    print(f"warm loss {float(m['loss']):.4f}", flush=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = js(state, batch)
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()
    # Persist the capture parameters so --no-capture reuse can't silently
    # divide by a mismatched step count.
    with open(os.path.join(trace_dir, "capture_meta.json"), "w") as f:
        json.dump({"steps": steps, "config": config,
                   "batch_size": batch_size, "task": task}, f)


def aggregate(trace_dir: str, steps: int, top: int,
              args_split: tuple = ()) -> None:
    from xprof.convert import raw_to_tool_data as r

    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = r.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    ix = {c: i for i, c in enumerate(cols)}
    rows = [[c.get("v") for c in row["c"]] for row in d["rows"]]

    div = steps * 1e3  # self-times are in us, summed over `steps` steps
    tot = sum((row[ix["total_self_time"]] or 0) for row in rows)
    remat = sum((row[ix["total_self_time"]] or 0) for row in rows
                if ".remat" in (row[ix["hlo_op_name"]] or ""))
    print(f"\ntotal {tot/div:.1f} ms/step; "
          f"XLA-remat duplicates {remat/div:.1f} ms/step")

    byop: collections.Counter = collections.Counter()
    for row in rows:
        fw = row[ix["tf_op_name"]] or "?"
        parts = fw.split("/")
        key = "/".join(parts[-3:]) if len(parts) > 3 else fw
        if "pallas_call" in key or (args_split and any(
                t in key for t in args_split)):
            # Split the bucket by HLO op: the program shape/name
            # distinguishes conv (3xNP operands) from attention kernels,
            # and (under --split) individual dot/transpose shapes.
            hlo = row[ix["hlo_op_name"]] or ""
            shp = row[ix.get("hlo_op_expression", ix.get("hlo_op_name"))]
            key += f" [{hlo[:40]} | {str(shp)[:80]}]"
        byop[key] += row[ix["total_self_time"]] or 0
    for k, t in byop.most_common(top):
        print(f"{t/div:8.2f} ms  {k[:160]}")


def aggregate_by_category(trace_dir: str, steps: int, top: int,
                          shapes_for: tuple = ()) -> None:
    """Aggregate by HLO opcode/fusion-kind (encoded in the HLO op name)
    instead of framework op path. This is the view that found the round-4
    glue decomposition: the fw-op view buries layout copies and unfused
    converts under 'transpose', while here `copy` / `convert_bitcast_fusion`
    / `concatenate` surface as their own rows. For any category named in
    `shapes_for`, a second table itemizes it by result shape + fw op, which
    is what attributes e.g. every convert_bitcast_fusion to the attention
    backward's (b,s,h,d) head relayouts."""
    import re

    from xprof.convert import raw_to_tool_data as r

    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.xplane.pb"))
    data, _ = r.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    ix = {c["id"]: i for i, c in enumerate(d["cols"])}
    rows = [[c.get("v") for c in row["c"]] for row in d["rows"]]
    div = steps * 1e3

    def category(row):
        hlo = (row[ix["hlo_op_name"]] or "")
        return re.sub(r"[.\d]+$", "", hlo.split("(")[0]) or "?"

    cat: collections.Counter = collections.Counter()
    n: collections.Counter = collections.Counter()
    for row in rows:
        c = category(row)
        cat[c] += row[ix["total_self_time"]] or 0
        n[c] += 1
    print(f"\nby HLO category ({sum(cat.values())/div:.1f} ms/step):")
    for k, t in cat.most_common(top):
        print(f"{t/div:8.2f} ms  {n[k]:5d} ops  {k}")

    for want in shapes_for:
        by: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        fw: dict = {}
        for row in rows:
            if category(row) != want:
                continue
            expr = str(row[ix.get("hlo_op_expression",
                                  ix["hlo_op_name"])])
            m = re.search(r"=\s*(\S+?\[[^\]]*\])", expr)
            shp = m.group(1) if m else expr[:50]
            by[shp] += row[ix["total_self_time"]] or 0
            cnt[shp] += 1
            # Collect ALL fw ops landing on this shape — a single-label
            # (last-writer-wins) table can misattribute the whole row when
            # different framework paths produce the same result shape.
            fw.setdefault(shp, set()).add(
                (row[ix["tf_op_name"]] or "?")[:90])
        print(f"\n{want} by result shape "
              f"({sum(by.values())/div:.2f} ms/step):")
        for k, t in by.most_common(14):
            ops = sorted(fw[k])
            label = ops[0] if len(ops) == 1 else (
                f"{ops[0]} (+{len(ops) - 1} more fw ops)")
            print(f"{t/div:7.2f} ms x{cnt[k]:3d}  {k}   [{label}]")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="imagenet-cls-224")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--task", default="cls", choices=["cls", "reg"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--split", default="",
                    help="comma-sep op substrings to de-aggregate by HLO shape (e.g. dot_general,transpose)")
    ap.add_argument("--by-category", default=None, const="", nargs="?",
                    help="also aggregate by HLO opcode/fusion kind; the "
                    "optional value is a comma-sep list of categories to "
                    "itemize by result shape (e.g. copy,convert_bitcast_fusion)")
    ap.add_argument("--no-capture", action="store_true",
                    help="reuse an existing --trace-dir without re-running")
    args = ap.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="calm_trace_")
    if not args.no_capture:
        capture(args.config, args.batch, args.steps, args.task, trace_dir)
    else:
        # Reusing a saved trace: every printed ms/step divides by --steps,
        # so it must match the original capture's step count.
        meta_path = os.path.join(trace_dir, "capture_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("steps") != args.steps:
                print(f"capture_meta.json says the trace was captured with "
                      f"steps={meta['steps']}; using that instead of "
                      f"--steps={args.steps}")
                args.steps = meta["steps"]
        else:
            print(f"WARNING: no capture_meta.json in {trace_dir}; assuming "
                  f"the trace was captured with --steps={args.steps} — "
                  f"every ms/step figure scales with that assumption")
    aggregate(trace_dir, args.steps, args.top,
              tuple(s for s in args.split.split(",") if s))
    if args.by_category is not None:
        aggregate_by_category(
            trace_dir, args.steps, args.top,
            tuple(s for s in args.by_category.split(",") if s))


if __name__ == "__main__":
    main()
