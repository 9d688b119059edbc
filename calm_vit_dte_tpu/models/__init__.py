from calm_vit_dte_tpu.models.vmla import VMLAConfig, vmla_init, vmla_apply
from calm_vit_dte_tpu.models.block import (
    BlockConfig,
    block_init,
    block_apply,
    axial_transpose,
    tokenize_image,
)
from calm_vit_dte_tpu.models.encoder_decoder import (
    EncoderDecoder8Config,
    encoder_decoder8_init,
    encoder_decoder8_apply,
    Encoder8Config,
    encoder8_init,
    encoder8_apply,
    CALMLatentDiffusionConfig,
    calm_latent_diffusion_init,
    calm_latent_diffusion_apply,
)
from calm_vit_dte_tpu.models.vit import (
    ViTConfig,
    vit_init,
    vit_apply,
    tokens_to_image,
)

__all__ = [
    "VMLAConfig", "vmla_init", "vmla_apply",
    "BlockConfig", "block_init", "block_apply",
    "axial_transpose", "tokenize_image",
    "EncoderDecoder8Config", "encoder_decoder8_init", "encoder_decoder8_apply",
    "Encoder8Config", "encoder8_init", "encoder8_apply",
    "CALMLatentDiffusionConfig", "calm_latent_diffusion_init",
    "calm_latent_diffusion_apply",
    "ViTConfig", "vit_init", "vit_apply", "tokens_to_image",
]
