"""Full flagship-config (224px, 42.58M params) eval parity vs the reference,
built live from /root/reference. Heavy (several minutes of compile), so
gated behind CALM_FULL_PARITY=1; the tiny goldens in test_parity_torch.py
cover the identical code paths at every layer type.
"""

import os
import sys

import numpy as np
import pytest

SKIP = os.environ.get("CALM_FULL_PARITY") == "0"
HAVE_REF = os.path.isdir("/root/reference/CALM-ViT")

pytestmark = pytest.mark.skipif(
    SKIP or not HAVE_REF,
    reason="reference not mounted (or CALM_FULL_PARITY=0)")


def test_full_224_cls_parity():
    import torch

    sys.path.insert(0, "/root/reference/CALM-ViT")
    import Vi_Tools_CNN_less_V2 as vt
    from torch.nn.utils import spectral_norm as sn

    import jax
    import jax.numpy as jnp

    from calm_vit_dte_tpu.compat.torch_import import import_torch_state_dict
    from calm_vit_dte_tpu.models.vit import ViTConfig, vit_apply, vit_init

    class RefViT(torch.nn.Module):
        # reference CALM_ViT_V2.py:21-84 wrapper (torchvision-free restating)
        def __init__(self):
            super().__init__()
            self.autoencoder = vt.EncoderDecoder_8(
                heads=12, dim1=672, dim_step=48, mean_var_hidden=240,
                seq_length=224, seq_len_step=16, seq_len_reduce=80)
            self.head = torch.nn.Sequential(
                sn(torch.nn.Linear(672, 1344, bias=False)),
                torch.nn.GELU(),
                sn(torch.nn.Linear(1344, 1000, bias=False)))

        def forward(self, q):
            x, kl = self.autoencoder(q)
            return self.head(x.mean(dim=1)), kl

    torch.manual_seed(0)
    ref = RefViT()
    x = torch.randn(1, 3, 224, 224)
    ref.train()
    with torch.no_grad():
        for _ in range(5):  # converge spectral-norm u,v
            ref(x)
    ref.eval()
    with torch.no_grad():
        y_ref, kl_ref = ref(x)

    cfg = ViTConfig(heads=12, seq_length=224, in_features=672, dim_step=48,
                    mean_var_hidden=240, seq_len_step=16, seq_len_reduce=80,
                    out_features=1000, generate=False)
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(params, state, ref.state_dict())
    xj = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    y, kl, _ = jax.jit(
        lambda p, s, x: vit_apply(cfg, p, s, x, training=False))(
        params, state, xj)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(float(kl), float(kl_ref), rtol=1e-3)
