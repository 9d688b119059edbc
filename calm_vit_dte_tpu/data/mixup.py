"""Batch-level CutMix / MixUp, jittable.

Reference uses torchvision v2 CutMix(num_classes=1000, alpha=1.0) and
MixUp(num_classes=1000, alpha=0.8) under RandomChoice in the collate_fn
(reference: distributed_trainer_cls.py:58-61). Semantics matched to
torchvision v2:
  * each batch applies exactly ONE of the two, chosen uniformly;
  * pairing partner is the batch rolled by 1;
  * MixUp: x = lam*x + (1-lam)*roll(x); labels mixed the same way;
  * CutMix: a random box (center uniform over the image, half-extent
    sqrt(1-lam)/2 of each side, clipped) is pasted from the rolled batch;
    lam is recomputed from the clipped box area;
  * lam ~ Beta(alpha, alpha).

Runs on device after augment_batch, inside the same jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    if labels.ndim == 2:
        return labels.astype(jnp.float32)  # already soft
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def mixup(key: jax.Array, images: jax.Array, labels1h: jax.Array,
          alpha: float = 0.8):
    lam = jax.random.beta(key, alpha, alpha)
    mixed = lam * images + (1.0 - lam) * jnp.roll(images, 1, axis=0)
    mixed_y = lam * labels1h + (1.0 - lam) * jnp.roll(labels1h, 1, axis=0)
    return mixed, mixed_y


def cutmix(key: jax.Array, images: jax.Array, labels1h: jax.Array,
           alpha: float = 1.0):
    b, h, w, c = images.shape
    k_lam, k_x, k_y = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    r_x = jax.random.randint(k_x, (), 0, w)
    r_y = jax.random.randint(k_y, (), 0, h)
    ratio = jnp.sqrt(1.0 - lam)
    half_w = jnp.floor(ratio * w / 2).astype(jnp.int32)
    half_h = jnp.floor(ratio * h / 2).astype(jnp.int32)
    x1 = jnp.clip(r_x - half_w, 0, w)
    x2 = jnp.clip(r_x + half_w, 0, w)
    y1 = jnp.clip(r_y - half_h, 0, h)
    y2 = jnp.clip(r_y + half_h, 0, h)
    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    in_box = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))
    mixed = jnp.where(in_box, jnp.roll(images, 1, axis=0), images)
    box_area = (x2 - x1) * (y2 - y1)
    lam_adj = 1.0 - box_area.astype(jnp.float32) / float(w * h)
    mixed_y = lam_adj * labels1h + (1.0 - lam_adj) * jnp.roll(labels1h, 1,
                                                              axis=0)
    return mixed, mixed_y


def cutmix_or_mixup(key: jax.Array, images: jax.Array, labels: jax.Array,
                    num_classes: int, mixup_alpha: float = 0.8,
                    cutmix_alpha: float = 1.0):
    """RandomChoice([CutMix, MixUp]) per batch. Returns (images, soft labels)."""
    k_choice, k_op = jax.random.split(key)
    labels1h = _one_hot(labels, num_classes)
    use_cutmix = jax.random.bernoulli(k_choice, 0.5)
    return jax.lax.cond(
        use_cutmix,
        lambda: cutmix(k_op, images, labels1h, cutmix_alpha),
        lambda: mixup(k_op, images, labels1h, mixup_alpha),
    )
