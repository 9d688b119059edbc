"""Regression/reconstruction training entry point — the reference's
distributed_trainer_reg.py, minus the Spark cluster (and minus its committed
SyntaxError at :158).

    python -m calm_vit_dte_tpu.train.train_reg [--config imagenet-reg-224]
"""

from __future__ import annotations

from calm_vit_dte_tpu.train.train_cls import main

if __name__ == "__main__":
    main(default_config="imagenet-reg-224")
