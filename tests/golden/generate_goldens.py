"""Generate golden activation files from the reference PyTorch model.

Run manually (requires /root/reference and CPU torch):
    python tests/golden/generate_goldens.py

Outputs .npz files consumed by tests/test_parity_torch.py. The reference is
imported from its read-only mount — no reference code is copied into this
repo; the goldens pin reference *behavior* (weights + activations at fixed
seeds, eval mode) so the parity tests run self-contained.

The reference's ViT wrapper (CALM_ViT_V2.py) imports torchvision, which is
not installed here; its forward is 10 lines (reference: CALM_ViT_V2.py:70-84)
so the cls/gen heads are replicated inline below for golden generation only.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import torch
from torch.nn.utils import spectral_norm as sn

REF = "/root/reference/CALM-ViT"
OUT = pathlib.Path(__file__).parent

sys.path.insert(0, REF)
import Vi_Tools_CNN_less_V2 as vt  # noqa: E402

TINY = dict(heads=3, dim1=144, dim_step=12, mean_var_hidden=24,
            seq_length=48, seq_len_step=4, seq_len_reduce=8)


def _sd_to_np(module):
    return {f"sd/{k}": v.detach().numpy() for k, v in
            module.state_dict().items()}


def _warm_sn(module, forward, n: int = 10):
    """Converge every spectral-norm (u, v) pair via train-mode forwards.

    At random init u,v are unaligned, sigma is near zero and W/sigma explodes
    — the reference NaNs within 8 blocks (SURVEY.md hard-part 5). Power
    iterations depend only on W, so a few throwaway train forwards make the
    goldens well-conditioned, matching the trained-checkpoint regime where
    parity actually matters."""
    module.train()
    with torch.no_grad():
        for _ in range(n):
            forward()
    module.eval()


def gen_vmla(name: str, **kwargs):
    torch.manual_seed(7)
    m = vt.VMLA_Block(**kwargs)
    torch.manual_seed(11)
    xq = torch.randn(2, kwargs["seq_length"], kwargs["dim1"])
    inputs = {"in/xq": xq.numpy()}
    if kwargs.get("is_cross"):
        xkv = torch.randn(2, kwargs["seq_length"], kwargs["dim1"])
        inputs["in/xkv"] = xkv.numpy()
        _warm_sn(m, lambda: m(xq, input_kv=xkv, mask=True))
    else:
        _warm_sn(m, lambda: m(xq, mask=True))
    with torch.no_grad():
        if kwargs.get("is_cross"):
            y = m(xq, input_kv=xkv, mask=True)
        else:
            y = m(xq, mask=True)
    np.savez(OUT / f"{name}.npz", **_sd_to_np(m), **inputs,
             **{"out/y": y.numpy()})
    print(name, y.shape)


def gen_block():
    torch.manual_seed(13)
    m = vt.Block(heads=3, dim1=144, dim_step=-12, mean_var_hidden=24,
                 seq_length=48, seq_len_step=-4, is_first_block=True,
                 is_last_block=False, seq_len_reduce=8)
    torch.manual_seed(17)
    x = torch.randn(2, 3, 48, 48)  # NCHW image, first block tokenizes
    _warm_sn(m, lambda: m(x, csm=vt.ResidualStateManager(mode="sum"),
                          mask=True))
    csm = vt.ResidualStateManager(mode="sum")
    with torch.no_grad():
        y = m(x, csm=csm, mask=True)
    np.savez(OUT / "block_first.npz", **_sd_to_np(m), **{"in/x": x.numpy()},
             **{"out/y": y.numpy(), "out/kl": np.float32(csm.get_kl_loss())})
    print("block_first", y.shape)


class _RefViT(torch.nn.Module):
    """Reference ViT wrapper re-stated for golden generation (the real one
    imports torchvision; forward per CALM_ViT_V2.py:35-84)."""

    def __init__(self, generate: bool, out_features: int):
        super().__init__()
        self.generate = generate
        self.autoencoder = vt.EncoderDecoder_8(
            heads=TINY["heads"], dim1=TINY["dim1"],
            dim_step=TINY["dim_step"],
            mean_var_hidden=TINY["mean_var_hidden"],
            seq_length=TINY["seq_length"],
            seq_len_step=TINY["seq_len_step"],
            seq_len_reduce=TINY["seq_len_reduce"],
            out_features_override=None, force_reduce=False)
        in_features = TINY["dim1"]
        if not generate:
            self.pool = torch.nn.AdaptiveAvgPool1d(1)
            self.head = torch.nn.Sequential(
                sn(torch.nn.Linear(in_features, in_features * 2, bias=False)),
                torch.nn.GELU(),
                sn(torch.nn.Linear(in_features * 2, out_features, bias=False)))
        else:
            hc = 32
            self.proj = torch.nn.Sequential(
                sn(torch.nn.Conv2d(3, hc, kernel_size=1, bias=True)),
                torch.nn.GELU(approximate="none"),
                sn(torch.nn.Conv2d(hc, hc, kernel_size=3, padding=1,
                                   bias=True, groups=hc)),
                torch.nn.GELU(approximate="none"),
                sn(torch.nn.Conv2d(hc, 3, kernel_size=1, bias=True)))

    def forward(self, q):
        x, kl = self.autoencoder(q)
        if not self.generate:
            x = x.permute(0, 2, 1)
            x = self.pool(x).squeeze(-1)
            x = self.head(x)
        else:
            s = x.shape[1]
            x_img = self.proj(x.reshape(x.shape[0], s, s, 3)
                              .permute(0, 3, 1, 2))
            x_img = x_img.permute(0, 2, 3, 1).reshape(x.shape[0], s, s * 3)
            x = x + x_img
        return x, kl


def gen_vit(name: str, generate: bool, out_features: int):
    torch.manual_seed(23)
    m = _RefViT(generate, out_features)
    torch.manual_seed(29)
    x = torch.randn(2, 3, 48, 48)
    _warm_sn(m, lambda: m(x))
    with torch.no_grad():
        y, kl = m(x)
    np.savez(OUT / f"{name}.npz", **_sd_to_np(m), **{"in/x": x.numpy()},
             **{"out/y": y.numpy(), "out/kl": np.float32(kl)})
    print(name, y.shape, "kl", float(kl))


def gen_sn_linear_train():
    """Spectral-norm training semantics: two consecutive train-mode forwards
    (power iteration updates u,v each call)."""
    torch.manual_seed(31)
    m = sn(torch.nn.Linear(24, 16, bias=False))
    m.train()
    torch.manual_seed(37)
    x1 = torch.randn(4, 24)
    x2 = torch.randn(4, 24)
    sd0 = {f"sd0/{k}": v.detach().clone().numpy()
           for k, v in m.state_dict().items()}
    with torch.no_grad():
        y1 = m(x1)
        sd1 = {f"sd1/{k}": v.detach().clone().numpy()
               for k, v in m.state_dict().items()}
        y2 = m(x2)
        sd2 = {f"sd2/{k}": v.detach().clone().numpy()
               for k, v in m.state_dict().items()}
    np.savez(OUT / "sn_linear_train.npz", **sd0, **sd1, **sd2,
             **{"in/x1": x1.numpy(), "in/x2": x2.numpy(),
                "out/y1": y1.numpy(), "out/y2": y2.numpy()})
    print("sn_linear_train")


def gen_rope():
    torch.manual_seed(41)
    m = vt.RoPE(seq=48, dim=24, learned=True)
    torch.manual_seed(43)
    x = torch.randn(2, 3, 48, 24)
    with torch.no_grad():
        y = m(x)
    np.savez(OUT / "rope.npz",
             **{"sd/inv_freq": m.inv_freq.detach().numpy(),
                "in/x": x.numpy(), "out/y": y.numpy()})
    print("rope", y.shape)


class _NoiseSeq:
    """Deterministic eps sequence shared with the JAX consumer
    (tests/test_parity_grad.py replays the same sequence through
    ops.variational.noise_override)."""

    def __init__(self):
        self.i = 0

    def __call__(self, shape):
        arr = np.random.default_rng(1000 + self.i).standard_normal(shape)
        self.i += 1
        return arr.astype(np.float32)


def gen_grad_traj(name: str, generate: bool, out_features: int,
                  steps: int = 10, steps_per_epoch: int = 2,
                  epochs: int = 5):
    """Backward-pass goldens: per-parameter gradients of the reference
    training loss for ONE step, plus a `steps`-step AdamW trajectory
    (losses + pre-clip grad norms + final weights).

    Mirrors the reference trainers exactly:
      * cls:  CrossEntropyLoss on soft labels (distributed_trainer_cls.py:63,86)
      * reg:  HuberLoss(delta=1) + 0.1*KL      (distributed_trainer_reg.py:59,88)
      * AdamW(3.1e-3, wd=0.02, betas=(0.9,0.98))   (cls trainer :158)
      * clip_grad_norm_(max_norm=1)                 (:92)
      * CosineAnnealingLR(T_max=epochs, eta_min=1e-6) stepped once per
        "epoch" = `steps_per_epoch` optimizer steps (:52,108-109) — small
        steps_per_epoch so the 10-step trajectory crosses schedule
        boundaries and pins the per-epoch timing.

    Train-mode noise is injected via a monkeypatched torch.randn_like (the
    cross-framework fixed-noise convention of tests/test_parity_train.py).
    """
    torch.manual_seed(23)
    m = _RefViT(generate, out_features)
    torch.manual_seed(29)
    x = torch.randn(2, 3, 48, 48)
    _warm_sn(m, lambda: m(x))
    # MUST deep-copy: _sd_to_np returns numpy VIEWS of the live tensors, and
    # np.savez only serializes at the end — after opt.step() has mutated the
    # weights in place (this silently saved the final weights as sd0 once).
    sd0 = {f"sd/{k}": v.detach().clone().numpy()
           for k, v in m.state_dict().items()}

    rng = np.random.default_rng(500)
    targets = None
    if not generate:
        logits = rng.standard_normal((2, out_features)).astype(np.float32)
        targets = torch.softmax(torch.from_numpy(logits), dim=1)

    noise = _NoiseSeq()
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t: torch.from_numpy(noise(tuple(t.shape)))
    try:
        m.train()
        opt = torch.optim.AdamW(m.parameters(), lr=3.1e-3,
                                betas=(0.9, 0.98), eps=1e-8,
                                weight_decay=0.02)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=epochs, eta_min=1e-6)
        ce = torch.nn.CrossEntropyLoss()
        hub = torch.nn.HuberLoss(delta=1.0)
        losses, gnorms = [], []
        grads0 = {}
        for t in range(steps):
            opt.zero_grad(set_to_none=True)
            y, kl = m(x)
            if not generate:
                loss = ce(y.squeeze(), targets)
            else:
                s = y.shape[1]
                img = y.reshape(-1, s, s, 3).permute(0, 3, 1, 2)
                loss = hub(img, x) + kl * 0.1
            loss.backward()
            if t == 0:
                grads0 = {
                    f"grad/{n}": (p.grad.detach().clone().numpy()
                                  if p.grad is not None
                                  else np.zeros(tuple(p.shape), np.float32))
                    for n, p in m.named_parameters()}
            gnorm = torch.nn.utils.clip_grad_norm_(
                m.parameters(), max_norm=1, error_if_nonfinite=False)
            opt.step()
            losses.append(float(loss))
            gnorms.append(float(gnorm))
            if (t + 1) % steps_per_epoch == 0:
                sched.step()
    finally:
        torch.randn_like = orig_randn_like

    assert noise.i > 0, "no train-mode noise was drawn"
    sdF = {f"sdF/{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    extra = {}
    if targets is not None:
        extra["in/targets"] = targets.numpy()
    np.savez(OUT / f"{name}.npz", **sd0, **grads0, **sdF,
             **{"in/x": x.numpy(),
                "out/losses": np.asarray(losses, np.float32),
                "out/gnorms": np.asarray(gnorms, np.float32),
                "out/noise_count": np.int64(noise.i)}, **extra)
    print(name, "losses", [round(v, 5) for v in losses])


def gen_encoder8():
    """Encoder_8 with a VALID config (the reference defaults crash on an odd
    RoPE dim): heads=3, dim_step=12 -> stages 144/108/72, all even."""
    torch.manual_seed(47)
    m = vt.Encoder_8(heads=3, dim1=144, dim_step=12, mean_var_hidden=24,
                     seq_length=48, seq_len_step=4, seq_len_reduce=8)
    torch.manual_seed(53)
    x = torch.randn(2, 3, 48, 48)
    _warm_sn(m, lambda: m(x))
    with torch.no_grad():
        y = m(x)
    np.savez(OUT / "encoder8.npz", **_sd_to_np(m), **{"in/x": x.numpy()},
             **{"out/y": y.numpy()})
    print("encoder8", y.shape)

if __name__ == "__main__":
    # `python generate_goldens.py grad` regenerates ONLY the backward-pass
    # goldens (leaves the committed forward goldens untouched).
    if len(sys.argv) > 1 and sys.argv[1] == "grad":
        gen_grad_traj("grad_traj_cls_tiny", generate=False, out_features=10)
        gen_grad_traj("grad_traj_reg_tiny", generate=True,
                      out_features=TINY["dim1"])
        sys.exit(0)
    gen_rope()
    gen_sn_linear_train()
    # Non-reduce self-attention layer (dim1 == dim2, same seq).
    gen_vmla("vmla_plain", heads=3, dim1=144, dim2=144, mean_var_hidden=24,
             seq_length=48, seq_len_reduce=8, seq_len_new=48, mlp_dim=288,
             force_reduce=False)
    # Reducing cross-attention layer (the variational path).
    gen_vmla("vmla_reduce", heads=3, dim1=144, dim2=108, mean_var_hidden=24,
             seq_length=48, seq_len_reduce=8, seq_len_new=36, mlp_dim=216,
             force_reduce=False, is_cross=True)
    gen_block()
    gen_vit("vit_cls_tiny", generate=False, out_features=10)
    gen_vit("vit_reg_tiny", generate=True, out_features=TINY["dim1"])
    gen_grad_traj("grad_traj_cls_tiny", generate=False, out_features=10)
    gen_grad_traj("grad_traj_reg_tiny", generate=True,
                  out_features=TINY["dim1"])
