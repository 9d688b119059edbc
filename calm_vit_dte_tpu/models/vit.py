"""ViT task wrapper: EncoderDecoder8 backbone plus a classification head
(mean-pool over sequence -> spectral-normed MLP d -> 2d -> num_classes) or a
generation head (the same 1x1/dw3x3/1x1 conv residual as Block.proj applied
to the image-shaped output).

Reference: CALM_ViT_V2.py:21-84. forward returns (logits_or_image_tokens,
kl_loss). Input is an NHWC image (B, H, W, 3) — TPU-native layout; the
compat layer converts NCHW torch batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.models.block import conv_residual_apply, conv_residual_init
from calm_vit_dte_tpu.models.encoder_decoder import (
    EncoderDecoder8Config,
    encoder_decoder8_apply,
    encoder_decoder8_init,
)
from calm_vit_dte_tpu.nn.linear import sn_linear_apply, sn_linear_init


@dataclass(frozen=True)
class ViTConfig:
    heads: int = 12
    seq_length: int = 256
    in_features: int = 768
    dim_step: int = 48
    mean_var_hidden: int = 192
    seq_len_step: int = 16
    seq_len_reduce: int = 128
    out_features: int = 1000
    force_reduce: bool = False
    generate: bool = True

    def backbone_cfg(self) -> EncoderDecoder8Config:
        return EncoderDecoder8Config(
            heads=self.heads, dim1=self.in_features, dim_step=self.dim_step,
            mean_var_hidden=self.mean_var_hidden, seq_length=self.seq_length,
            seq_len_step=self.seq_len_step,
            seq_len_reduce=self.seq_len_reduce,
            out_features_override=None, force_reduce=self.force_reduce)

    def validate(self):
        if self.in_features != 3 * self.seq_length:
            raise ValueError(
                f"row tokenization requires in_features == 3*seq_length, got "
                f"{self.in_features} != 3*{self.seq_length}")
        if self.dim_step != 3 * self.seq_len_step:
            raise ValueError(
                "dim/seq invariant requires dim_step == 3*seq_len_step")
        for name, bcfg in self.backbone_cfg().block_configs():
            bcfg.cross_cfg().validate()


def vit_init(cfg: ViTConfig, key: jax.Array) -> tuple[dict, dict]:
    cfg.validate()
    kb, kh = jax.random.split(key)
    params: dict = {}
    state: dict = {}
    params["autoencoder"], state["autoencoder"] = encoder_decoder8_init(
        cfg.backbone_cfg(), kb)
    if not cfg.generate:
        k1, k2 = jax.random.split(kh)
        p1, s1 = sn_linear_init(k1, cfg.in_features, cfg.in_features * 2)
        p2, s2 = sn_linear_init(k2, cfg.in_features * 2, cfg.out_features)
        params["head"] = {"fc1": p1, "fc2": p2}
        state["head"] = {"fc1": s1, "fc2": s2}
    else:
        params["proj"], state["proj"] = conv_residual_init(kh)
    return params, state


def vit_apply(cfg: ViTConfig, params: dict, state: dict, x: jax.Array, *,
              training: bool, rng: jax.Array | None = None,
              dtype=jnp.float32, use_mask: bool = True,
              ) -> tuple[jax.Array, jax.Array, dict]:
    """x: NHWC image. Returns (logits | image tokens (B,S,3S), kl, state')."""
    new_state = dict(state)
    x = x.astype(dtype)
    feats, kl, new_state["autoencoder"] = encoder_decoder8_apply(
        cfg.backbone_cfg(), params["autoencoder"], state["autoencoder"], x,
        training=training, rng=rng, dtype=dtype, use_mask=use_mask)
    if not cfg.generate:
        pooled = jnp.mean(feats, axis=1)  # AdaptiveAvgPool1d over sequence
        h, st1 = sn_linear_apply(params["head"]["fc1"], state["head"]["fc1"],
                                 pooled, training=training, dtype=dtype)
        h = jax.nn.gelu(h, approximate=False)
        logits, st2 = sn_linear_apply(params["head"]["fc2"],
                                      state["head"]["fc2"], h,
                                      training=training, dtype=dtype)
        new_state["head"] = {"fc1": st1, "fc2": st2}
        return logits, kl, new_state
    x_img, new_state["proj"] = conv_residual_apply(
        params["proj"], state["proj"], feats, training=training, dtype=dtype)
    return feats + x_img, kl, new_state


def tokens_to_image(tokens: jax.Array) -> jax.Array:
    """(B, S, 3S) row tokens -> NHWC image (B, S, S, 3). Inverse of the
    first block's tokenization; used by the reconstruction loss (reference
    distributed_trainer_reg.py:78-79 reshapes to NHWC then NCHW — we stay
    NHWC)."""
    b, s, _ = tokens.shape
    return tokens.reshape(b, s, s, 3)
