#!/usr/bin/env bash
# Reconstruction launcher — replaces the reference's train-reg.sh
# spark-submit (reference: CALM-ViT/train-reg.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m calm_vit_dte_tpu.train.train_reg --config "${CONFIG:-imagenet-reg-224}" "$@"
