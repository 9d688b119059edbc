"""Golden-activation parity against the reference PyTorch model.

Goldens are generated once from the reference (tests/golden/generate_goldens.py,
reads /root/reference) and committed, so this suite runs self-contained:
reference weights are imported into our pytrees and eval-mode forwards must
match within fp32 tolerance.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calm_vit_dte_tpu.compat.torch_import import import_torch_state_dict
from calm_vit_dte_tpu.models.block import BlockConfig, block_apply, block_init
from calm_vit_dte_tpu.models.vit import ViTConfig, vit_apply, vit_init
from calm_vit_dte_tpu.models.vmla import VMLAConfig, vmla_apply, vmla_init
from calm_vit_dte_tpu.nn.linear import sn_linear_apply
from calm_vit_dte_tpu.ops.latent_state import LatentState
from calm_vit_dte_tpu.ops.rope import rope_apply

GOLDEN = pathlib.Path(__file__).parent / "golden"


def load(name):
    d = np.load(GOLDEN / f"{name}.npz")
    sd = {k[3:]: d[k] for k in d.files if k.startswith("sd/")}
    ins = {k[3:]: d[k] for k in d.files if k.startswith("in/")}
    outs = {k[4:]: d[k] for k in d.files if k.startswith("out/")}
    return sd, ins, outs


def test_rope_parity():
    sd, ins, outs = load("rope")
    params = {"inv_freq": jnp.asarray(sd["inv_freq"])}
    y = rope_apply(params, jnp.asarray(ins["x"]))
    np.testing.assert_allclose(np.asarray(y), outs["y"], rtol=1e-5, atol=1e-5)


def test_sn_linear_train_parity():
    """Two train-mode forwards: y and the updated (u, v) must match torch's
    power-iteration semantics exactly."""
    d = np.load(GOLDEN / "sn_linear_train.npz")
    params = {"w": jnp.asarray(d["sd0/weight_orig"])}
    state = {"u": jnp.asarray(d["sd0/weight_u"]),
             "v": jnp.asarray(d["sd0/weight_v"])}
    y1, state = sn_linear_apply(params, state, jnp.asarray(d["in/x1"]),
                                training=True)
    np.testing.assert_allclose(np.asarray(y1), d["out/y1"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["u"]), d["sd1/weight_u"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["v"]), d["sd1/weight_v"],
                               rtol=1e-5, atol=1e-6)
    y2, state = sn_linear_apply(params, state, jnp.asarray(d["in/x2"]),
                                training=True)
    np.testing.assert_allclose(np.asarray(y2), d["out/y2"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["u"]), d["sd2/weight_u"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name,cfg", [
    ("vmla_plain", VMLAConfig(heads=3, dim1=144, dim2=144,
                              mean_var_hidden=24, seq_length=48,
                              seq_len_reduce=8, seq_len_new=48, mlp_dim=288)),
    ("vmla_reduce", VMLAConfig(heads=3, dim1=144, dim2=108,
                               mean_var_hidden=24, seq_length=48,
                               seq_len_reduce=8, seq_len_new=36, mlp_dim=216,
                               is_cross=True)),
])
def test_vmla_parity(name, cfg):
    sd, ins, outs = load(name)
    params, state = vmla_init(cfg, jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(params, state, sd)
    xq = jnp.asarray(ins["xq"])
    xkv = jnp.asarray(ins["xkv"]) if "xkv" in ins else None
    y, _, _ = jax.jit(
        lambda p, s, q, kv: vmla_apply(cfg, p, s, q, input_kv=kv,
                                       training=False)
    )(params, state, xq, xkv) if xkv is not None else jax.jit(
        lambda p, s, q: vmla_apply(cfg, p, s, q, training=False)
    )(params, state, xq)
    np.testing.assert_allclose(np.asarray(y), outs["y"], rtol=2e-4, atol=2e-5)


def test_block_parity():
    sd, ins, outs = load("block_first")
    cfg = BlockConfig(heads=3, dim1=144, dim_step=-12, mean_var_hidden=24,
                      seq_length=48, seq_len_step=-4, is_first_block=True,
                      is_last_block=False, seq_len_reduce=8)
    params, state = block_init(cfg, jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(params, state, sd)
    x = jnp.asarray(ins["x"]).transpose(0, 2, 3, 1)  # NCHW golden -> NHWC

    def fwd(p, s, x):
        csm = LatentState(mode="sum")
        y, _ = block_apply(cfg, p, s, x, csm=csm, training=False)
        return y, csm.kl_loss()

    y, kl = jax.jit(fwd)(params, state, x)
    np.testing.assert_allclose(np.asarray(y), outs["y"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(kl), outs["kl"], rtol=1e-4)


@pytest.mark.parametrize("name,generate,out_features", [
    ("vit_cls_tiny", False, 10),
    ("vit_reg_tiny", True, 144),
])
def test_vit_parity(name, generate, out_features):
    sd, ins, outs = load(name)
    cfg = ViTConfig(heads=3, seq_length=48, in_features=144, dim_step=12,
                    mean_var_hidden=24, seq_len_step=4, seq_len_reduce=8,
                    out_features=out_features, generate=generate)
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    params, state = import_torch_state_dict(params, state, sd)
    x = jnp.asarray(ins["x"]).transpose(0, 2, 3, 1)
    y, kl, _ = jax.jit(
        lambda p, s, x: vit_apply(cfg, p, s, x, training=False)
    )(params, state, x)
    np.testing.assert_allclose(np.asarray(y), outs["y"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(kl), outs["kl"], rtol=1e-4)


def test_encoder8_parity():
    """Encoder_8 (encoder-only classification stack) vs the reference at a
    valid config — the reference defaults crash on an odd RoPE dim."""
    from calm_vit_dte_tpu.models.encoder_decoder import (
        Encoder8Config,
        encoder8_apply,
        encoder8_init,
    )

    sd, ins, outs = load("encoder8")
    cfg = Encoder8Config(heads=3, dim1=144, dim_step=12, mean_var_hidden=24,
                         seq_length=48, seq_len_step=4, seq_len_reduce=8)
    params, state = encoder8_init(cfg, jax.random.PRNGKey(0))
    # torch names blocks encoder_blocks.{i} -> our block_{i}
    sd = {k.replace("encoder_blocks.", "block_"): v for k, v in sd.items()}
    params, state = import_torch_state_dict(params, state, sd)
    x = jnp.asarray(ins["x"]).transpose(0, 2, 3, 1)
    y, _ = jax.jit(
        lambda p, s, x: encoder8_apply(cfg, p, s, x, training=False))(
        params, state, x)
    np.testing.assert_allclose(np.asarray(y), outs["y"], rtol=1e-3,
                               atol=1e-4)
