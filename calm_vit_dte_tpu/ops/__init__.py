from calm_vit_dte_tpu.ops.rope import rope_init, rope_apply
from calm_vit_dte_tpu.ops.variational import (
    softplus_var,
    reparameterize,
    kl_divergence,
)
from calm_vit_dte_tpu.ops.latent_state import LatentState
from calm_vit_dte_tpu.ops.attention import masked_attention

__all__ = [
    "rope_init",
    "rope_apply",
    "softplus_var",
    "reparameterize",
    "kl_divergence",
    "LatentState",
    "masked_attention",
]
