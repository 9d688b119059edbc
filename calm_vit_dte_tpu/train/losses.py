"""Training losses, matching the reference trainers.

Classification (reference: distributed_trainer_cls.py:63,86): softmax
cross-entropy against CutMix/MixUp *soft* label distributions (torch
CrossEntropyLoss with probability targets); the KL term is discarded (:85).

Regression/reconstruction (reference: distributed_trainer_reg.py:59,76-88):
Huber(delta=1) between the reconstructed image and the input, plus
0.1 * KL. The reference reshapes tokens to NHWC then NCHW; we compare in
NHWC directly (elementwise loss — layout-invariant).

All losses reduce in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """targets: soft label distribution (B, C) or int labels (B,)."""
    logits = logits.astype(jnp.float32)
    if targets.ndim == logits.ndim - 1:
        targets = jax.nn.one_hot(targets, logits.shape[-1],
                                 dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets.astype(jnp.float32) * logp, axis=-1))


def huber(pred: jax.Array, target: jax.Array,
          delta: float = 1.0) -> jax.Array:
    """torch.nn.HuberLoss(delta, reduction='mean')."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    ad = jnp.abs(d)
    per = jnp.where(ad < delta, 0.5 * d * d, delta * (ad - 0.5 * delta))
    return jnp.mean(per)


def reconstruction_loss(tokens: jax.Array, image_nhwc: jax.Array,
                        kl: jax.Array, kl_weight: float = 0.1) -> jax.Array:
    """tokens: (B, S, 3S) model output; image: (B, S, S, 3) input."""
    b, s, _ = tokens.shape
    recon = tokens.reshape(b, s, s, 3)
    return huber(recon, image_nhwc) + kl_weight * kl.astype(jnp.float32)


def dominant_class_accuracy(logits: jax.Array,
                            targets: jax.Array) -> jax.Array:
    """Accuracy on the dominant class under soft labels (reference
    'I don't want to write soft accuracy', distributed_trainer_cls.py:98-102)."""
    pred = jnp.argmax(logits, axis=-1)
    lab = jnp.argmax(targets, axis=-1) if targets.ndim == 2 else targets
    return jnp.mean((pred == lab).astype(jnp.float32))
