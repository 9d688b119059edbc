"""Model factory: build a ViT by config name with optional weight loading.

The reference's initialize_vit (CALM_ViT_V2.py:120-142) is broken dead code
(passes kwargs ViT doesn't accept, shadows the `type` builtin); this is the
working equivalent: named config -> (cfg, params, state), optionally
warm-started from a reference .pth or an Orbax checkpoint directory.
"""

from __future__ import annotations

import os

import jax

from calm_vit_dte_tpu.models.vit import vit_init
from calm_vit_dte_tpu.utils.configs import get_config


def create_vit(config_name: str = "imagenet-cls-224",
               weights: str | None = None, seed: int = 0,
               **model_overrides):
    """Returns (ViTConfig, params, sn_state).

    weights: None (fresh init), a reference .pth path, or an Orbax
    checkpoint directory (restores params + spectral-norm state).
    """
    import dataclasses

    cfg = get_config(config_name).model
    if model_overrides:
        cfg = dataclasses.replace(cfg, **model_overrides)
    params, sn_state = vit_init(cfg, jax.random.PRNGKey(seed))
    if weights is None:
        return cfg, params, sn_state
    if weights.endswith(".pth"):
        import torch

        from calm_vit_dte_tpu.compat.torch_import import (
            import_torch_state_dict,
        )

        sd = torch.load(weights, map_location="cpu", weights_only=True)
        params, sn_state = import_torch_state_dict(params, sn_state, sd)
        return cfg, params, sn_state
    if os.path.isdir(weights):
        from calm_vit_dte_tpu.train.checkpoint import restore_checkpoint
        from calm_vit_dte_tpu.train.optim import make_optimizer
        from calm_vit_dte_tpu.train.state import create_train_state

        tx = make_optimizer(epochs=1, steps_per_epoch=1)
        template = create_train_state(params, sn_state, tx,
                                      jax.random.PRNGKey(seed + 1))
        restored = restore_checkpoint(weights, template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {weights}")
        return cfg, restored.params, restored.sn_state
    raise ValueError(f"unsupported weights source: {weights}")
