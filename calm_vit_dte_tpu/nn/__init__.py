from calm_vit_dte_tpu.nn import init
from calm_vit_dte_tpu.nn.linear import (
    linear_init,
    linear_apply,
    sn_linear_init,
    sn_linear_apply,
)
from calm_vit_dte_tpu.nn.conv import sn_conv2d_init, sn_conv2d_apply
from calm_vit_dte_tpu.nn.norm import layer_norm_init, layer_norm_apply
from calm_vit_dte_tpu.nn.spectral_norm import (
    spectral_normalize,
    sn_state_init,
    power_iteration,
)

__all__ = [
    "init",
    "linear_init",
    "linear_apply",
    "sn_linear_init",
    "sn_linear_apply",
    "sn_conv2d_init",
    "sn_conv2d_apply",
    "layer_norm_init",
    "layer_norm_apply",
    "spectral_normalize",
    "sn_state_init",
    "power_iteration",
]
