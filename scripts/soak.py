"""Multi-epoch endurance soak of the production trainer on real hardware.

The reference's one empirical artifact class is a genuinely trained model
(65 epochs; distributed_trainer_cls.py:72-111,166-167). This soak validates
the rebuilt trainer as a LONG-RUNNING PROCESS: the flagship cls config over
a staged on-disk JPEG corpus, crossing many epoch boundaries — per-epoch
sampler reshuffle (seed 2006), per-epoch Orbax checkpoints with max_to_keep
rotation, the BatchLoader + native decoder running the whole time — while
recording p50 step time, steps/s, and RSS per epoch to a JSONL.

Phases:
  1. stage: write a synthetic JPEG ImageFolder corpus (default 100 classes
     x 320 images at 256px) under --corpus (skipped when already staged);
  2. run: launch the UNMODIFIED production trainer CLI
     (calm_vit_dte_tpu.train.train_cls) as a subprocess with
     epoch_stats_path set, let it run --minutes, then SIGTERM it — which
     also exercises the checkpoint-and-exit preemption path;
  3. summarize: fold the per-epoch JSONL into docs/evidence/soak.json
     (epochs crossed, p50 drift first->last, RSS growth, checkpoint
     rotation state, SIGTERM checkpoint step).

Usage:
  python scripts/soak.py --minutes 50
  python scripts/soak.py --stage-only        # just build the corpus
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
DEFAULT_CORPUS = REPO / ".soak_corpus"
DEFAULT_CKPT = REPO / ".soak_ckpt"
EVIDENCE = REPO / "docs" / "evidence"


def stage_corpus(root: pathlib.Path, classes: int, per_class: int,
                 size: int, split: str = "train") -> None:
    """Synthetic JPEG ImageFolder corpus: structured images (per-class hue
    gradient + per-image phase) so decode cost and file sizes resemble
    photos rather than noise (noise JPEGs are pathologically large) or
    solids (pathologically small)."""
    import numpy as np
    from PIL import Image

    marker = root / f".staged_{split}"
    want = {"classes": classes, "per_class": per_class, "size": size}
    if marker.exists() and json.loads(marker.read_text()) == want:
        print(f"corpus already staged at {root}/{split}", flush=True)
        return
    t0 = time.time()
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    rng = np.random.default_rng(2006 if split == "train" else 7)
    for c in range(classes):
        d = root / split / f"class_{c:04d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            ph = rng.uniform(0, 6.28, 3)
            fr = rng.uniform(3, 9, 3)
            img = np.stack([
                127 + 120 * np.sin(fr[k] * (xx + yy * (c % 7 - 3) / 3)
                                   + ph[k]) for k in range(3)], -1)
            img = (img + rng.normal(0, 12, img.shape)).clip(0, 255)
            buf = io.BytesIO()
            Image.fromarray(img.astype(np.uint8)).save(
                buf, "JPEG", quality=85)
            (d / f"img_{i:05d}.jpg").write_bytes(buf.getvalue())
        if c % 10 == 0:
            print(f"staged class {c}/{classes} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    marker.write_text(json.dumps(want))
    n = classes * per_class
    mb = sum(f.stat().st_size for f in root.rglob("*.jpg")) / 1e6
    print(f"corpus staged: {n} JPEGs, {mb:.0f} MB, "
          f"{time.time() - t0:.0f}s", flush=True)


def run_soak(args) -> dict:
    stats_path = EVIDENCE / "soak_epochs.jsonl"
    stats_path.parent.mkdir(parents=True, exist_ok=True)
    if stats_path.exists() and not args.keep_stats:
        stats_path.unlink()
    cmd = [
        sys.executable, "-m", "calm_vit_dte_tpu.train.train_cls",
        "--config", args.config,
        f"dataset_root={args.corpus}",
        f"checkpoint_dir={args.ckpt_dir}",
        f"global_batch_size={args.batch}",
        f"microbatch={args.microbatch}",
        f"epoch_stats_path={stats_path}",
        "log_every=50",
    ]
    print("launching:", " ".join(cmd), flush=True)
    log_path = EVIDENCE / "soak_train.log"
    t0 = time.time()
    with open(log_path, "a" if args.keep_stats else "w") as log:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=log,
                                stderr=subprocess.STDOUT)
        deadline = t0 + args.minutes * 60
        rc = None
        while time.time() < deadline:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(10)
        if rc is None:
            print(f"{args.minutes} min elapsed; sending SIGTERM "
                  "(exercises checkpoint-and-exit)", flush=True)
            proc.send_signal(signal.SIGTERM)
            try:
                rc = proc.wait(timeout=600)
            except subprocess.TimeoutExpired:
                proc.kill()
                rc = -9
    wall = time.time() - t0

    rows = [json.loads(line) for line in
            stats_path.read_text().splitlines()] if stats_path.exists() \
        else []
    log_text = log_path.read_text() if log_path.exists() else ""
    sigterm_ckpt = "SIGTERM: checkpointed at step" in log_text
    resumes = log_text.count("resumed from step")
    ckpt_steps = sorted(
        int(p.name) for p in pathlib.Path(args.ckpt_dir).iterdir()
        if p.is_dir() and p.name.isdigit()) \
        if os.path.isdir(args.ckpt_dir) else []

    summary = {
        "wall_s": round(wall, 1),
        "rc": rc,
        "epochs_completed": len(rows),
        "steps_total": sum(r["steps"] for r in rows),
        "p50_first_epoch_s": rows[0]["p50_step_s"] if rows else None,
        "p50_last_epoch_s": rows[-1]["p50_step_s"] if rows else None,
        "p50_all": sorted(r["p50_step_s"] for r in rows if r["p50_step_s"])
        if rows else [],
        "img_per_s_first": rows[0]["img_per_s"] if rows else None,
        "img_per_s_last": rows[-1]["img_per_s"] if rows else None,
        "rss_mb_first": rows[0]["rss_mb"] if rows else None,
        "rss_mb_last": rows[-1]["rss_mb"] if rows else None,
        "loss_first": rows[0]["loss"] if rows else None,
        "loss_last": rows[-1]["loss"] if rows else None,
        "sigterm_checkpointed": sigterm_ckpt,
        "resumed_segments": resumes,
        "checkpoints_kept": ckpt_steps,
        "max_to_keep_respected": len(ckpt_steps) <= 3,
        "config": {"config": args.config, "batch": args.batch,
                   "microbatch": args.microbatch,
                   "corpus": str(args.corpus), "minutes": args.minutes},
        "ts": time.time(),
    }
    out = EVIDENCE / "soak.json"
    out.write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps(summary, indent=1), flush=True)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=pathlib.Path, default=DEFAULT_CORPUS)
    ap.add_argument("--ckpt-dir", default=str(DEFAULT_CKPT))
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--per-class", type=int, default=320)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--minutes", type=float, default=50)
    ap.add_argument("--config", default="imagenet-cls-224")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--microbatch", type=int, default=4)
    ap.add_argument("--stage-only", action="store_true")
    ap.add_argument("--keep-stats", action="store_true",
                    help="append to the existing epoch JSONL (resumed "
                    "soak segment: the trainer restores the .soak_ckpt "
                    "checkpoint and continues)")
    args = ap.parse_args()
    stage_corpus(args.corpus, args.classes, args.per_class, args.img_size)
    if args.stage_only:
        return
    run_soak(args)


if __name__ == "__main__":
    main()
