"""Classification training entry point — the reference's
distributed_trainer_cls.py, minus the Spark cluster.

    python -m calm_vit_dte_tpu.train.train_cls [--config imagenet-cls-224]
                                               [--key value ...]

Multi-host: launch one process per host with COORDINATOR_ADDRESS set (or on
TPU pods just run the same command on every host) — no Spark master, no
barrier scheduling, no file-on-NFS coordination.
"""

from __future__ import annotations

import argparse

from calm_vit_dte_tpu.train.trainer import train
from calm_vit_dte_tpu.utils.configs import get_config


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        for cast in (int, float):
            try:
                v = cast(v)
                break
            except ValueError:
                continue
        out[k] = v
    return out


def main(default_config: str = "imagenet-cls-224") -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=default_config)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("overrides", nargs="*",
                    help="TrainConfig field overrides, key=value")
    args = ap.parse_args()
    cfg = get_config(args.config, **_parse_overrides(args.overrides))
    train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
