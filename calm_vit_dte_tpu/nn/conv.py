"""Spectral-normalized 2-D convolution (functional, NHWC).

The reference's per-block conv residual (1x1 -> GELU -> depthwise 3x3 -> GELU
-> 1x1, reference: Vi_Tools_CNN_less_V2.py:379-385) runs in torch NCHW; the
surrounding code reshapes sequence tensors (B,S,3S) -> (B,S,S,3), which is
already NHWC. We therefore convolve natively in NHWC (TPU-preferred layout)
and skip the reference's NCHW permute round-trip entirely.

Weights are stored in torch OIHW layout so reference .pth checkpoints import
directly; spectral norm uses the same (out_c, -1) 2-D view as torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn import init as vinit
from calm_vit_dte_tpu.nn.spectral_norm import sn_state_init, spectral_normalize


def sn_conv2d_init(key: jax.Array, in_c: int, out_c: int, kernel: int, *,
                   groups: int = 1, bias: bool = True) -> tuple[dict, dict]:
    kw, kb, ks = jax.random.split(key, 3)
    fan_in = (in_c // groups) * kernel * kernel
    params = {
        "w": vinit.kaiming_uniform(
            kw, (out_c, in_c // groups, kernel, kernel), fan_in=fan_in),
    }
    if bias:
        params["b"] = vinit.bias_uniform(kb, (out_c,), fan_in=fan_in)
    state = sn_state_init(ks, out_c, (in_c // groups) * kernel * kernel)
    return params, state


def sn_conv2d_apply(params: dict, state: dict, x: jax.Array, *,
                    groups: int = 1, padding: str | int = "SAME",
                    training: bool, dtype=None) -> tuple[jax.Array, dict]:
    """x: (B, H, W, C) NHWC. Returns (y NHWC, new spectral-norm state)."""
    dtype = dtype or x.dtype
    w_norm, new_state = spectral_normalize(params["w"], state,
                                           training=training)
    # OIHW -> HWIO for lax conv.
    w = jnp.transpose(w_norm, (2, 3, 1, 0)).astype(dtype)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=(1, 1),
        padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(dtype)
    return y, new_state
