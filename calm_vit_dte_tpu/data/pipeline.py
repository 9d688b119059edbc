"""Fused on-device preprocessing callables for the train step.

These run inside the jitted train step (see train/step.py preprocess arg):
raw uint8 batches cross host->device, then crop/jitter/blur/normalize and
CutMix/MixUp execute as part of the same XLA program as the model forward —
the north-star on-device input pipeline replacing the reference's host-side
torchvision transforms + collate_fn.
"""

from __future__ import annotations

import jax

from calm_vit_dte_tpu.data.augment import augment_batch, eval_preprocess
from calm_vit_dte_tpu.data.mixup import cutmix_or_mixup


def make_cls_preprocess(num_classes: int, crop: int = 224):
    """Augment + CutMix/MixUp; returns {'image': f32, 'label': soft (B,C)}."""

    def preprocess(key: jax.Array, batch: dict) -> dict:
        k_aug, k_mix = jax.random.split(key)
        img = augment_batch(k_aug, batch["image"], crop=crop)
        img, labels = cutmix_or_mixup(k_mix, img, batch["label"],
                                      num_classes)
        return {"image": img, "label": labels}

    return preprocess


def make_reg_preprocess(crop: int = 224):
    """Augment only — the reconstruction task has no mixup (reference:
    distributed_trainer_reg.py:58)."""

    def preprocess(key: jax.Array, batch: dict) -> dict:
        img = augment_batch(key, batch["image"], crop=crop)
        return {"image": img}

    return preprocess


def make_eval_preprocess(crop: int = 224):
    def preprocess(batch: dict) -> dict:
        out = {"image": eval_preprocess(batch["image"], crop=crop)}
        for key in ("label", "valid"):
            if key in batch:
                out[key] = batch[key]
        return out

    return preprocess
