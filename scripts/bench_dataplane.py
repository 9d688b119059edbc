"""End-to-end data-plane benchmark (VERDICT r3 item 3).

Measures, on a real on-disk JPEG corpus (data/corpus.py — no network
egress here, so procedural JPEGs stand in for staged ImageNet; they are
real libjpeg work at the same sizes):

  1. standalone decode+resize throughput: native C++ pool
     (native/decoder.cpp) vs thread count vs pure PIL, in img/s and MB/s;
  2. integrated training throughput: the production BatchLoader +
     ImageFolderDataset feeding the real flagship train step from disk,
     vs the same step on a resident synthetic batch;
  3. a stall analysis: host-decode rate vs chip consumption rate, and the
     host core count required for the loader to keep the chip fed.

Writes docs/evidence/dataplane.json and prints a summary. Reference bar:
the torchvision DataLoader (num_workers=5) feeding 4xA100
(reference: distributed_trainer_cls.py:62).

  python scripts/bench_dataplane.py [--images 512] [--steps 12]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

EVIDENCE = pathlib.Path(__file__).resolve().parents[1] / "docs" / "evidence"


def bench_standalone(paths: list[str], size: int, threads: list[int],
                     repeat: int = 3) -> dict:
    from calm_vit_dte_tpu.data import native

    total_bytes = sum(os.path.getsize(p) for p in paths)
    out: dict = {"n_images": len(paths), "decode_size": size,
                 "mean_jpeg_kb": round(total_bytes / len(paths) / 1024, 1)}

    if native.available():
        for nt in threads:
            times = []
            for _ in range(repeat):
                t0 = time.perf_counter()
                imgs, ok = native.decode_resize_batch(paths, size,
                                                      n_threads=nt)
                times.append(time.perf_counter() - t0)
            assert ok.all(), "native decode failures in bench corpus"
            dt = min(times)
            out[f"native_{nt}t_img_per_s"] = round(len(paths) / dt, 1)
            out[f"native_{nt}t_mb_per_s"] = round(
                total_bytes / dt / 1e6, 1)
    else:
        out["native"] = "unavailable"

    from PIL import Image

    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        for p in paths:
            with Image.open(p) as im:
                im = im.convert("RGB").resize((size, size), Image.BILINEAR)
                np.asarray(im)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out["pil_img_per_s"] = round(len(paths) / dt, 1)
    out["pil_mb_per_s"] = round(total_bytes / dt / 1e6, 1)
    return out


def bench_integrated(root: str, batch: int, steps: int, size: int) -> dict:
    """Production loader feeding the production step from disk vs the same
    step on one resident synthetic batch."""
    import jax
    import jax.numpy as jnp

    from calm_vit_dte_tpu.data.loader import BatchLoader, ImageFolderDataset
    from calm_vit_dte_tpu.data.pipeline import make_cls_preprocess
    from calm_vit_dte_tpu.data.sampler import ShardedSampler
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config("imagenet-cls-224")
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        cfg.epochs, steps_per_epoch=1000)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    step_fn = make_train_step(cfg.model, tx, "cls", dtype=jnp.bfloat16,
                              remat=False,
                              preprocess=make_cls_preprocess(1000, cfg.crop))
    jit_step = jax.jit(step_fn, donate_argnums=0)

    # Synthetic resident batch (what bench.py times).
    rng = np.random.default_rng(0)
    syn = {"image": jnp.asarray(rng.integers(
               0, 256, (batch, size, size, 3), dtype=np.uint8)),
           "label": jnp.asarray(rng.integers(0, 1000, (batch,),
                                             dtype=np.int32))}
    state, _ = jit_step(state, syn)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = jit_step(state, syn)
    jax.block_until_ready(state.params)
    syn_ips = batch * steps / (time.perf_counter() - t0)

    # Loader-only throughput (no device work): the pipe's ceiling.
    ds = ImageFolderDataset(root, split="train", size=size)
    sampler = ShardedSampler(len(ds), 1, 0, seed=0)
    loader = BatchLoader(ds, sampler, batch, num_workers=cfg.num_workers)
    it = iter(loader)
    next(it)
    n = 0
    t0 = time.perf_counter()
    for _ in it:
        n += 1
        if n >= steps:
            break
    loader_only_ips = batch * n / (time.perf_counter() - t0)

    # Real loader from disk feeding the chip.
    loader = BatchLoader(ds, sampler, batch, num_workers=cfg.num_workers)
    it = iter(loader)
    first = next(it)  # let workers spin up / not counted
    state, _ = jit_step(state, {k: jnp.asarray(v) for k, v in
                                first.items()})
    jax.block_until_ready(state.params)
    n = 0
    t0 = time.perf_counter()
    for hb in it:
        state, _ = jit_step(state, {k: jnp.asarray(v) for k, v in
                                    hb.items()})
        n += 1
        if n >= steps:
            break
    jax.block_until_ready(state.params)
    real_ips = batch * n / (time.perf_counter() - t0)
    return {"batch": batch, "steps": steps,
            "synthetic_img_per_s": round(syn_ips, 1),
            "loader_only_img_per_s": round(loader_only_ips, 1),
            "real_loader_img_per_s": round(real_ips, 1),
            "ratio": round(real_ips / syn_ips, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512,
                    help="standalone decode sample size")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--root", default="/tmp/calm_corpus_learnable")
    ap.add_argument("--skip-integrated", action="store_true",
                    help="standalone decode numbers only (no TPU step)")
    args = ap.parse_args()

    from calm_vit_dte_tpu.data.corpus import make_corpus
    from calm_vit_dte_tpu.utils.configs import get_config

    make_corpus(args.root, n_train=2048, n_val=512, num_classes=10,
                mode="learnable", seed=12)
    size = get_config("imagenet-cls-224").image_size

    base = pathlib.Path(args.root) / "train"
    paths = sorted(str(p) for c in sorted(base.iterdir())
                   for p in sorted(c.iterdir()))[:args.images]
    cores = os.cpu_count() or 1
    result = {"host_cores": cores,
              "standalone": bench_standalone(paths, size,
                                             threads=[1, 2, 4])}
    print(json.dumps(result["standalone"], indent=1), flush=True)

    if not args.skip_integrated:
        result["integrated"] = bench_integrated(args.root, args.batch,
                                                args.steps, size)
        print(json.dumps(result["integrated"], indent=1), flush=True)

        # Stall analysis: cores needed for the decode pool to match the
        # chip's synthetic consumption rate.
        best_1t = max(result["standalone"].get("native_1t_img_per_s", 0.0),
                      result["standalone"]["pil_img_per_s"])
        syn = result["integrated"]["synthetic_img_per_s"]
        result["stall_analysis"] = {
            "per_core_decode_img_per_s": best_1t,
            "chip_demand_img_per_s": syn,
            "cores_needed_to_feed_chip": round(syn / best_1t, 1),
            "host_bound": result["integrated"]["ratio"] < 0.95,
        }
        print(json.dumps(result["stall_analysis"], indent=1), flush=True)

    EVIDENCE.mkdir(parents=True, exist_ok=True)
    (EVIDENCE / "dataplane.json").write_text(json.dumps(result, indent=1))
    print(f"wrote {EVIDENCE / 'dataplane.json'}", flush=True)


if __name__ == "__main__":
    main()
