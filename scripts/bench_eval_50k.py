"""Full-val-scale evaluation bench (VERDICT r4 item 7).

The reference evaluated on the real 50,000-image ImageNet val split
(/root/reference/CALM-ViT/CALM_ViT_V2.py:174-178,227-240); the rebuild's
eval throughput had only ever been measured on resident synthetic batches.
This bench runs the production `evaluate()` — BatchLoader + ShardedSampler
+ native JPEG decode + pad_last masking + jitted bf16 eval step — over a
staged ImageNet-val-sized corpus (100 classes x 500 JPEGs = 50,000 images)
and records sustained end-to-end img/s, wall time, and where the time went
(loader wait vs host->device transfer + chip compute).

Environment note (see NOTES.md "soak" section): in this environment the
chip is behind a remote tunnel, so the host->device batch upload costs
~1.1 s per ~25 MB instead of a ~2.5 ms PCIe copy; the device_s bucket here
is transfer-dominated and the resident-batch rate (bench.py eval field)
remains the chip-compute number.

Usage:
  python scripts/bench_eval_50k.py [--batch 128] [--max-batches N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

VAL_CORPUS = REPO / ".eval50k_corpus"
EVIDENCE = REPO / "docs" / "evidence"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--per-class", type=int, default=500)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--stage-only", action="store_true")
    args = ap.parse_args()

    from soak import stage_corpus

    stage_corpus(VAL_CORPUS, args.classes, args.per_class, 256, split="val")
    if args.stage_only:
        return

    from calm_vit_dte_tpu.train.evaluate import evaluate
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = dataclasses.replace(
        get_config("imagenet-cls-224"),
        dataset_root=str(VAL_CORPUS),
        global_batch_size=args.batch,
        checkpoint_dir=str(REPO / ".eval50k_nonexistent_ckpt"))

    stats: dict = {}
    t0 = time.time()
    acc = evaluate(cfg, max_batches=args.max_batches, stats_out=stats)
    summary = {
        "corpus_images": args.classes * args.per_class,
        "batch": args.batch,
        "top1": round(acc, 4),  # fresh init — throughput bench, not accuracy
        **stats,
        "loader_share": round(stats["loader_wait_s"] / stats["wall_s"], 3),
        "device_share": round(stats["device_s"] / stats["wall_s"], 3),
        "total_wall_s": round(time.time() - t0, 1),
        "ts": time.time(),
    }
    EVIDENCE.mkdir(parents=True, exist_ok=True)
    (EVIDENCE / "eval_50k.json").write_text(
        json.dumps(summary, indent=1) + "\n")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
