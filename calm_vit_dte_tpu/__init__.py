"""CALM-ViT-DTE-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the reference CALM-ViT-DTE (cross-axial latent-masking ViT +
distributed training environment).

Layer map (bottom-up), mirroring the reference's four layers
(reference: SURVEY.md section 1):

  nn/       pure-functional NN core: params/state pytrees, torch-compatible
            initializers, spectral-norm linears/convs as explicit-state ops
  ops/      model math primitives: learned RoPE, variational bottleneck,
            latent residual state carry, masked attention (XLA reference path)
  kernels/  Pallas TPU kernels (fused axial attention with learned masking)
  models/   VMLA block, CALM Block, EncoderDecoder8 / Encoder8, ViT wrapper
  data/     input pipeline: on-device augmentations, CutMix/MixUp, sharded
            deterministic sampling (DistributedSampler-equivalent)
  parallel/ device mesh + sharded train step (shard_map data parallelism)
  train/    losses, optimizer, train state, checkpointing, trainer entry
            points (classification / regression-reconstruction)
  utils/    config system (named configs reproducing the reference's
            hyperparameters), logging, profiling
  compat/   torch .pth state-dict import for parity/migration
"""

__version__ = "0.1.0"
