"""CALM stage Block: row self-attention -> axial transpose -> column
self-attention -> transpose back -> row/column cross-attention (resolution
change) -> conv residual.

Reference: Vi_Tools_CNN_less_V2.py:317-403. The first block tokenizes the
image: (B, 3, H, W) -> each token is a full image *row* with RGB-interleaved
pixels as features (B, H, W*3), requiring the invariant dim == 3 * seq. The
axial transpose views (B, S, 3S) as (B, S, S, 3) and swaps the two spatial
axes. Each block ends with a 1x1 -> GELU -> depthwise 3x3 -> GELU -> 1x1
conv residual on the image-shaped tensor ("we CNN now", reference :377).

TPU-native deltas from the reference:
  * the conv residual runs directly in NHWC — the (B, S, S, 3) view IS NHWC,
    so the reference's NCHW permute round-trip (:400-401) disappears;
  * inputs arrive as NHWC images (B, H, W, 3); the first block's tokenization
    is a single reshape.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.models.vmla import VMLAConfig, vmla_apply, vmla_init
from calm_vit_dte_tpu.nn.conv import sn_conv2d_init, sn_conv2d_apply
from calm_vit_dte_tpu.ops.latent_state import LatentState

CONV_HIDDEN = 32


@dataclass(frozen=True)
class BlockConfig:
    heads: int
    dim1: int
    dim_step: int
    mean_var_hidden: int
    seq_length: int
    seq_len_step: int
    is_first_block: bool
    is_last_block: bool
    seq_len_reduce: int
    force_reduce: bool = False
    out_features_override: int | None = None

    @property
    def dim2(self) -> int:
        if self.out_features_override is not None:
            return self.out_features_override
        return self.dim1 + self.dim_step * 3

    @property
    def seq_len_new(self) -> int:
        return self.seq_length + self.seq_len_step * 3

    def encoder_cfg(self) -> VMLAConfig:
        return VMLAConfig(
            heads=self.heads, dim1=self.dim1, dim2=self.dim1,
            mean_var_hidden=self.mean_var_hidden,
            seq_length=self.seq_length, seq_len_reduce=self.seq_len_reduce,
            seq_len_new=self.seq_length, mlp_dim=self.dim1 * 2,
            force_reduce=self.force_reduce, use_mlp=True)

    def decoder_cfg(self) -> VMLAConfig:
        return self.encoder_cfg()

    def cross_cfg(self) -> VMLAConfig:
        return VMLAConfig(
            heads=self.heads, dim1=self.dim1, dim2=self.dim2,
            mean_var_hidden=self.mean_var_hidden,
            seq_length=self.seq_length, seq_len_reduce=self.seq_len_reduce,
            seq_len_new=self.seq_len_new,
            # mlp width always follows dim1 + 3*dim_step, even when the output
            # dim is overridden (reference :371).
            mlp_dim=(self.dim1 + self.dim_step * 3) * 2,
            force_reduce=self.force_reduce, is_cross=True, use_mlp=True)


def conv_residual_init(key: jax.Array) -> tuple[dict, dict]:
    """The 1x1 -> dw3x3 -> 1x1 conv stack (reference :379-385)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = sn_conv2d_init(k1, 3, CONV_HIDDEN, 1, bias=True)
    p2, s2 = sn_conv2d_init(k2, CONV_HIDDEN, CONV_HIDDEN, 3,
                            groups=CONV_HIDDEN, bias=True)
    p3, s3 = sn_conv2d_init(k3, CONV_HIDDEN, 3, 1, bias=True)
    return ({"conv1": p1, "conv2": p2, "conv3": p3},
            {"conv1": s1, "conv2": s2, "conv3": s3})


def conv_residual_apply(params: dict, state: dict, x_seq: jax.Array, *,
                        training: bool, dtype) -> tuple[jax.Array, dict]:
    """x_seq: (B, S, 3S) row tokens -> conv residual term (B, S, 3S).

    On TPU the whole chain runs as one fused Pallas kernel (the 32-channel
    hidden tensor never leaves VMEM — in XLA it makes ~5 HBM round trips per
    direction, 411 MB at batch 128 / S 224); XLA lax.conv fallback
    elsewhere."""
    b, s, _ = x_seq.shape
    img = x_seq.reshape(b, s, s, 3)  # NHWC directly

    import os

    # Dispatch (all measured in-step on v5e, b128 — NOTES.md round-3 conv
    # log): the fused kernel's FORWARD beats the XLA chain ~3x (12 vs 33
    # ms/step over the S>=128 stages), but every fused BACKWARD tried
    # (recomputing pallas, saved-residual pallas, saved-residual XLA taps,
    # saved-residual conv-vjp) loses to XLA's own fused NHWC autodiff of
    # the lax chain (step 209.6-218.7 vs 202.0 ms). So: eval/serving
    # (no backward) takes the pallas forward; training defaults to the lax
    # chain. CALM_CONV_FUSED=1 forces the fused path for training A/Bs,
    # =0 disables it everywhere.
    fused_env = os.environ.get("CALM_CONV_FUSED", "")
    if fused_env not in ("", "0", "1"):
        raise ValueError(f"CALM_CONV_FUSED={fused_env!r}: expected "
                         "'0' or '1'")
    use_fused = False
    if (jax.default_backend() == "tpu" and fused_env != "0"
            and (not training or fused_env == "1")):
        from calm_vit_dte_tpu.kernels import conv_residual as kcr

        use_fused = kcr.supported(b, s)
    if use_fused:
        from calm_vit_dte_tpu.kernels.conv_residual import (
            fused_conv_residual,
        )
        from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

        w1, st1 = spectral_normalize(params["conv1"]["w"], state["conv1"],
                                     training=training)
        wd, st2 = spectral_normalize(params["conv2"]["w"], state["conv2"],
                                     training=training)
        w2, st3 = spectral_normalize(params["conv3"]["w"], state["conv3"],
                                     training=training)
        y = fused_conv_residual(
            img,
            w1.reshape(CONV_HIDDEN, 3), params["conv1"]["b"],
            jnp.transpose(wd, (2, 3, 1, 0)).reshape(3, 3, CONV_HIDDEN),
            params["conv2"]["b"],
            w2.reshape(3, CONV_HIDDEN), params["conv3"]["b"],
            dtype=dtype)
        return (y.reshape(b, s, s * 3),
                {"conv1": st1, "conv2": st2, "conv3": st3})

    impl = os.environ.get("CALM_CONV_IMPL", "lax")
    if impl not in ("lax", "mix", "tap"):
        # An unknown value (typo, stale experiment flag) must not silently
        # select a different formulation: in a multi-host SPMD program an
        # env var differing across hosts or traces would change numerics.
        raise ValueError(
            f"CALM_CONV_IMPL={impl!r}: expected 'lax', 'mix', or 'tap'")
    if impl != "lax":
        from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

        w1, st1 = spectral_normalize(params["conv1"]["w"], state["conv1"],
                                     training=training)
        wd, st2 = spectral_normalize(params["conv2"]["w"], state["conv2"],
                                     training=training)
        w2, st3 = spectral_normalize(params["conv3"]["w"], state["conv3"],
                                     training=training)
        xc = img.astype(dtype)
        # 1x1 convs as plain matmuls over the channel axis (the conv op
        # pads 3/32-channel tensors catastrophically on TPU).
        a1 = jnp.einsum("bhwc,oc->bhwo", xc,
                        w1.reshape(CONV_HIDDEN, 3).astype(dtype))
        a1 = a1 + params["conv1"]["b"].astype(a1.dtype)
        h = jax.nn.gelu(a1, approximate=False).astype(dtype)
        if impl == "tap":
            # depthwise 3x3 as 9 statically shifted fmas, fp32 accumulate.
            wd9 = jnp.transpose(wd, (2, 3, 1, 0)).reshape(3, 3, CONV_HIDDEN)
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = params["conv2"]["b"].astype(jnp.float32) * jnp.ones(
                h.shape, jnp.float32)
            for ta in range(3):
                for tb in range(3):
                    acc = acc + (hp[:, ta:ta + s, tb:tb + s, :]
                                 .astype(jnp.float32) * wd9[ta, tb])
            d = jax.nn.gelu(acc, approximate=False).astype(dtype)
        else:  # "mix": 1x1s as matmuls, depthwise via lax.conv
            dw = jnp.transpose(wd, (2, 3, 1, 0))  # HWIO (3,3,1,32)
            d = jax.lax.conv_general_dilated(
                h, dw.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=CONV_HIDDEN)
            d = d + params["conv2"]["b"].astype(d.dtype)
            d = jax.nn.gelu(d, approximate=False).astype(dtype)
        y = jnp.einsum("bhwo,co->bhwc", d,
                       w2.reshape(3, CONV_HIDDEN).astype(dtype))
        y = y + params["conv3"]["b"].astype(y.dtype)
        return (y.reshape(b, s, s * 3),
                {"conv1": st1, "conv2": st2, "conv3": st3})

    y, st1 = sn_conv2d_apply(params["conv1"], state["conv1"], img,
                             training=training, dtype=dtype)
    y = jax.nn.gelu(y, approximate=False)
    y, st2 = sn_conv2d_apply(params["conv2"], state["conv2"], y,
                             groups=CONV_HIDDEN, training=training,
                             dtype=dtype)
    y = jax.nn.gelu(y, approximate=False)
    y, st3 = sn_conv2d_apply(params["conv3"], state["conv3"], y,
                             training=training, dtype=dtype)
    return (y.reshape(b, s, s * 3),
            {"conv1": st1, "conv2": st2, "conv3": st3})


def block_init(cfg: BlockConfig, key: jax.Array) -> tuple[dict, dict]:
    ke, kd, kc, kp = jax.random.split(key, 4)
    pe, se = vmla_init(cfg.encoder_cfg(), ke)
    pd, sd = vmla_init(cfg.decoder_cfg(), kd)
    pc, sc = vmla_init(cfg.cross_cfg(), kc)
    pp, sp = conv_residual_init(kp)
    return ({"encoder": pe, "decoder": pd, "cross": pc, "proj": pp},
            {"encoder": se, "decoder": sd, "cross": sc, "proj": sp})


def axial_transpose(x: jax.Array) -> jax.Array:
    """(B, S, 3S) row tokens <-> column tokens (reference :394-398)."""
    b, s, _ = x.shape
    return x.reshape(b, s, s, 3).transpose(0, 2, 1, 3).reshape(b, s, s * 3)


def tokenize_image(x: jax.Array) -> jax.Array:
    """NHWC image (B, H, W, 3) -> row tokens (B, H, W*3)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w * c)


def block_apply(cfg: BlockConfig, params: dict, state: dict, x: jax.Array,
                esm: LatentState | None = None,
                dsm: LatentState | None = None,
                csm: LatentState | None = None, *, training: bool,
                rng: jax.Array | None = None, dtype=jnp.float32,
                use_mask: bool = True) -> tuple[jax.Array, dict]:
    if rng is not None:
        r_enc, r_dec, r_cross = jax.random.split(rng, 3)
    else:
        r_enc = r_dec = r_cross = None
    new_state = dict(state)

    xq = x
    if cfg.is_first_block:
        xq = tokenize_image(xq)
    xq, new_state["encoder"], esm = vmla_apply(
        cfg.encoder_cfg(), params["encoder"], state["encoder"], xq,
        latent=esm, training=training, rng=r_enc, dtype=dtype,
        use_mask=use_mask)
    xkv = axial_transpose(xq)
    xkv, new_state["decoder"], dsm = vmla_apply(
        cfg.decoder_cfg(), params["decoder"], state["decoder"], xkv,
        latent=dsm, training=training, rng=r_dec, dtype=dtype,
        use_mask=use_mask)
    xkv = axial_transpose(xkv)
    x, new_state["cross"], csm = vmla_apply(
        cfg.cross_cfg(), params["cross"], state["cross"], xq, input_kv=xkv,
        latent=csm, training=training, rng=r_cross, dtype=dtype,
        use_mask=use_mask)
    x_img, new_state["proj"] = conv_residual_apply(
        params["proj"], state["proj"], x, training=training, dtype=dtype)
    from jax.ad_checkpoint import checkpoint_name

    # Named so the remat policy can SAVE the conv residual: the fused conv
    # kernel then runs once per step instead of fwd + remat-replay + bwd
    # (train/step.py save list; 38 MB bf16 per stage at batch 128/S=224).
    x_img = checkpoint_name(x_img, "conv_out")
    return x + x_img, new_state
