"""Model stacks: EncoderDecoder8 (U-Net-shaped, 8 blocks / 24 attention
layers), Encoder8 (encoder-only, for classification), CALMLatentDiffusion.

Reference: Vi_Tools_CNN_less_V2.py:407-533 (EncoderDecoder_8), :600-656
(Encoder_8), :535-595 (CALMLatentDiffusion).

EncoderDecoder8: 3 encoder blocks stepping dim/seq down by 3*step each, two
bottleneck blocks at constant shape, 3 decoder blocks stepping back up, long
U-Net skip connections, final LayerNorm. A single shared latent accumulator
("sum" mode) threads through all six stepped cross layers; it yields the KL
loss returned alongside the activations.

Encoder8: 8 blocks, stepping at blocks 2 and 5, skip-adds whenever shapes
match, no latent accumulators. The reference's Encoder_8 defaults crash
(odd RoPE dim, SURVEY.md s2a); configs here are validated at construction.

CALMLatentDiffusion: the reference version has no forward method (dead/WIP,
SURVEY.md s2a); we build the same 3+3 block stack and provide the natural
forward (encoder blocks -> decoder blocks with mirrored skips -> final LN,
shared cross latent state), clearly marked as completing the reference's WIP.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.models.block import BlockConfig, block_apply, block_init
from calm_vit_dte_tpu.nn.norm import layer_norm_init, layer_norm_apply
from calm_vit_dte_tpu.ops.latent_state import LatentState


@dataclass(frozen=True)
class EncoderDecoder8Config:
    heads: int = 12
    dim1: int = 768
    dim_step: int = 48
    mean_var_hidden: int = 192
    seq_length: int = 256
    seq_len_step: int = 16
    seq_len_reduce: int = 128
    out_features_override: int | None = None
    force_reduce: bool = False

    def block_configs(self) -> list[tuple[str, BlockConfig]]:
        blocks = []
        dim, seq = self.dim1, self.seq_length
        for i in range(3):
            blocks.append((f"encoder_{i}", BlockConfig(
                heads=self.heads, dim1=dim, dim_step=-self.dim_step,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=-self.seq_len_step,
                is_first_block=(i == 0), is_last_block=False,
                seq_len_reduce=self.seq_len_reduce,
                force_reduce=self.force_reduce)))
            dim -= self.dim_step * 3
            seq -= self.seq_len_step * 3
        for name in ("bottleneck_1", "bottleneck_2"):
            blocks.append((name, BlockConfig(
                heads=self.heads, dim1=dim, dim_step=0,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=0, is_first_block=False, is_last_block=False,
                seq_len_reduce=self.seq_len_reduce,
                force_reduce=self.force_reduce)))
        for i in range(3):
            blocks.append((f"decoder_{i}", BlockConfig(
                heads=self.heads, dim1=dim, dim_step=self.dim_step,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=self.seq_len_step,
                is_first_block=False, is_last_block=(i == 2),
                seq_len_reduce=self.seq_len_reduce,
                out_features_override=(self.out_features_override
                                       if i == 2 else None),
                force_reduce=self.force_reduce)))
            dim += self.dim_step * 3
            seq += self.seq_len_step * 3
        return blocks

    @property
    def final_dim(self) -> int:
        return self.dim1  # symmetric stack returns to the input dim


def encoder_decoder8_init(cfg: EncoderDecoder8Config,
                          key: jax.Array) -> tuple[dict, dict]:
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks))
    params: dict = {}
    state: dict = {}
    for (name, bcfg), k in zip(blocks, keys):
        params[name], state[name] = block_init(bcfg, k)
    params["ln_final"] = layer_norm_init(cfg.final_dim)
    return params, state


def encoder_decoder8_apply(cfg: EncoderDecoder8Config, params: dict,
                           state: dict, x: jax.Array, *, training: bool,
                           rng: jax.Array | None = None, dtype=jnp.float32,
                           use_mask: bool = True,
                           ) -> tuple[jax.Array, jax.Array, dict]:
    """x: NHWC image (B, H, W, 3). Returns (tokens (B,S,3S), kl_loss, state')."""
    blocks = cfg.block_configs()
    esm = LatentState(mode="sum") if cfg.force_reduce else None
    dsm = LatentState(mode="sum") if cfg.force_reduce else None
    csm = LatentState(mode="sum")
    new_state = dict(state)

    def run(i: int, x: jax.Array) -> jax.Array:
        name, bcfg = blocks[i]
        r = jax.random.fold_in(rng, i) if rng is not None else None
        y, new_state[name] = block_apply(
            bcfg, params[name], state[name], x, esm=esm, dsm=dsm, csm=csm,
            training=training, rng=r, dtype=dtype, use_mask=use_mask)
        return y

    skips = {}
    for i in range(3):
        x = run(i, x)
        skips[i] = x  # skip_1, skip_2, skip_bn_1
    x = run(3, x)  # bottleneck_1
    x = x + skips[2]
    skip_bn_2 = x
    x = run(4, x)  # bottleneck_2
    x = x + skip_bn_2 + skips[2]
    for i in range(3):
        x = run(5 + i, x)
        if i == 0:
            x = x + skips[1]
        elif i == 1:
            x = x + skips[0]
    x = layer_norm_apply(params["ln_final"], x, dtype=dtype)

    kl = csm.kl_loss()
    if cfg.force_reduce:
        kl = esm.kl_loss() + dsm.kl_loss() + kl
    return x, kl, new_state


@dataclass(frozen=True)
class Encoder8Config:
    """Encoder-only 8-block stack (reference :600-640). NOTE: the reference
    defaults (dim1=672, dim_step=24) produce stage dim 600 with heads=12 —
    an odd RoPE dim that crashes the reference in forward. Stage dims must
    satisfy dim % (4*heads) == 0; use e.g. dim_step=48."""
    heads: int = 12
    dim1: int = 672
    dim_step: int = 48
    mean_var_hidden: int = 192
    seq_length: int = 224
    seq_len_step: int = 16
    seq_len_reduce: int = 96
    force_reduce: bool = False

    def block_configs(self) -> list[tuple[str, BlockConfig]]:
        blocks = []
        dim, seq = self.dim1, self.seq_length
        for i in range(8):
            step = i in (2, 5)
            blocks.append((f"block_{i}", BlockConfig(
                heads=self.heads, dim1=dim,
                dim_step=-self.dim_step if step else 0,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=-self.seq_len_step if step else 0,
                is_first_block=(i == 0), is_last_block=(i == 7),
                seq_len_reduce=self.seq_len_reduce,
                force_reduce=self.force_reduce)))
            if step:
                dim -= self.dim_step * 3
                seq -= self.seq_len_step * 3
        return blocks

    @property
    def final_dim(self) -> int:
        return self.dim1 - 2 * self.dim_step * 3


def encoder8_init(cfg: Encoder8Config, key: jax.Array) -> tuple[dict, dict]:
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks))
    params: dict = {}
    state: dict = {}
    for (name, bcfg), k in zip(blocks, keys):
        params[name], state[name] = block_init(bcfg, k)
    params["ln_final"] = layer_norm_init(cfg.final_dim)
    return params, state


def encoder8_apply(cfg: Encoder8Config, params: dict, state: dict,
                   x: jax.Array, *, training: bool,
                   rng: jax.Array | None = None, dtype=jnp.float32,
                   use_mask: bool = True) -> tuple[jax.Array, dict]:
    """No latent accumulators: each layer learns independent representations
    (reference :643-646). Skip-adds whenever consecutive shapes match."""
    new_state = dict(state)
    skip = None
    for i, (name, bcfg) in enumerate(cfg.block_configs()):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        x, new_state[name] = block_apply(
            bcfg, params[name], state[name], x, training=training, rng=r,
            dtype=dtype, use_mask=use_mask)
        if skip is None or x.shape != skip.shape:
            skip = x
        else:
            x = x + skip
            skip = x
    x = layer_norm_apply(params["ln_final"], x, dtype=dtype)
    return x, new_state


@dataclass(frozen=True)
class CALMLatentDiffusionConfig:
    """3+3 enc/dec latent stack (reference :535-595; constructor only there —
    the forward here completes the WIP with the natural U-Net wiring)."""
    heads: int = 12
    dim1: int = 672
    dim_step: int = 48
    mean_var_hidden: int = 204
    mean_var_hidden_diffusion: int = 96
    seq_length: int = 224
    seq_len_step: int = 16
    seq_len_reduce: int = 80
    seq_len_reduce_diffusion: int = 32
    out_features_override: int | None = None
    force_reduce: bool = False

    def block_configs(self) -> list[tuple[str, BlockConfig]]:
        blocks = []
        dim, seq = self.dim1, self.seq_length
        for i in range(3):
            blocks.append((f"encoder_{i}", BlockConfig(
                heads=self.heads, dim1=dim, dim_step=-self.dim_step,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=-self.seq_len_step,
                is_first_block=(i == 0), is_last_block=False,
                seq_len_reduce=self.seq_len_reduce,
                force_reduce=self.force_reduce)))
            dim -= self.dim_step * 3
            seq -= self.seq_len_step * 3
        for i in range(3):
            blocks.append((f"decoder_{i}", BlockConfig(
                heads=self.heads, dim1=dim, dim_step=self.dim_step,
                mean_var_hidden=self.mean_var_hidden, seq_length=seq,
                seq_len_step=self.seq_len_step,
                is_first_block=False, is_last_block=(i == 2),
                seq_len_reduce=self.seq_len_reduce,
                out_features_override=(self.out_features_override
                                       if i == 2 else None),
                force_reduce=self.force_reduce)))
            dim += self.dim_step * 3
            seq += self.seq_len_step * 3
        return blocks

    @property
    def final_dim(self) -> int:
        return self.dim1


def calm_latent_diffusion_init(cfg: CALMLatentDiffusionConfig,
                               key: jax.Array) -> tuple[dict, dict]:
    blocks = cfg.block_configs()
    keys = jax.random.split(key, len(blocks))
    params: dict = {}
    state: dict = {}
    for (name, bcfg), k in zip(blocks, keys):
        params[name], state[name] = block_init(bcfg, k)
    params["ln_final"] = layer_norm_init(cfg.final_dim)
    return params, state


def calm_latent_diffusion_apply(cfg: CALMLatentDiffusionConfig, params: dict,
                                state: dict, x: jax.Array, *, training: bool,
                                rng: jax.Array | None = None,
                                dtype=jnp.float32, use_mask: bool = True,
                                ) -> tuple[jax.Array, jax.Array, dict]:
    blocks = cfg.block_configs()
    csm = LatentState(mode="sum")
    new_state = dict(state)
    skips = []
    for i, (name, bcfg) in enumerate(blocks[:3]):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        x, new_state[name] = block_apply(
            bcfg, params[name], state[name], x, csm=csm, training=training,
            rng=r, dtype=dtype, use_mask=use_mask)
        skips.append(x)
    for i, (name, bcfg) in enumerate(blocks[3:]):
        r = jax.random.fold_in(rng, 3 + i) if rng is not None else None
        x, new_state[name] = block_apply(
            bcfg, params[name], state[name], x, csm=csm, training=training,
            rng=r, dtype=dtype, use_mask=use_mask)
        if i == 0:
            x = x + skips[1]
        elif i == 1:
            x = x + skips[0]
    x = layer_norm_apply(params["ln_final"], x, dtype=dtype)
    return x, csm.kl_loss(), new_state
