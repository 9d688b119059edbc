"""Generated-sample dumper (reference: CALM_ViT_V2.py:113-118 save_samples:
sigmoid -> HWC -> PNG per image, written by the chief each epoch from the
regression trainer, distributed_trainer_reg.py:101-104)."""

from __future__ import annotations

import os

import jax
import numpy as np


def save_samples(tokens_or_images, out_dir: str, prefix: str = "sample",
                 max_images: int = 16) -> list[str]:
    """tokens_or_images: (B, S, 3S) row tokens or (B, H, W, 3) images."""
    from PIL import Image

    x = np.asarray(jax.device_get(tokens_or_images), dtype=np.float32)
    if x.ndim == 3:  # row tokens -> NHWC
        b, s, _ = x.shape
        x = x.reshape(b, s, s, 3)
    x = 1.0 / (1.0 + np.exp(-x))  # sigmoid
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, img in enumerate(x[:max_images]):
        p = os.path.join(out_dir, f"{prefix}_{i}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths
