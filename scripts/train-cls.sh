#!/usr/bin/env bash
# Classification launcher — replaces the reference's train-cls.sh
# spark-submit (reference: CALM-ViT/train-cls.sh:3-24). On a single host or
# any TPU slice: run this once per host; JAX's runtime handles rendezvous
# (no Spark master, no GPU discovery script, no barrier scheduling).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m calm_vit_dte_tpu.train.train_cls --config "${CONFIG:-imagenet-cls-224}" "$@"
