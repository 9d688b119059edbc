"""Generate per-op augmentation goldens (VERDICT r3 item 4).

The reference augmentation chain (reference: CALM_ViT_V2.py:159-170) is
torchvision.transforms.v2. torchvision is NOT installed in this
environment (and cannot be), so the oracle below is an independent NumPy
transcription of torchvision's documented per-op algorithms
(torchvision.transforms.v2.functional: _blend, rgb_to_grayscale,
adjust_{brightness,contrast,saturation,hue}, solarize, gaussian_blur,
normalize — float path, plus the uint8 rounding the reference chain
actually runs under since ToDtype(float32, scale=True) comes LAST).

It deliberately shares no code with calm_vit_dte_tpu/data/augment.py:
hue goes through the classic indexed HSV<->RGB formulation (the one
torchvision implements) rather than augment.py's branchless form, and the
blur builds the kernel from the generic arange formula. Agreement between
the two is then a real check, not a tautology.

Run manually:  python tests/golden/generate_aug_goldens.py
Outputs tests/golden/augment_ops.npz consumed by tests/test_augment.py.
"""

from __future__ import annotations

import pathlib

import numpy as np

OUT = pathlib.Path(__file__).parent / "augment_ops.npz"


# ---- torchvision float-path oracle (NumPy) --------------------------------

def gray(img):
    """rgb_to_grayscale, ITU-R 601 weights (torchvision float path)."""
    return (0.2989 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def blend(a, b, f):
    """torchvision _blend: f*a + (1-f)*b, clamped to [0, 1] (float path)."""
    return np.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def brightness(img, f):
    return blend(img, np.zeros_like(img), f)


def contrast(img, f):
    m = gray(img).mean(axis=(-3, -2, -1), keepdims=True)
    return blend(img, np.broadcast_to(m, img.shape), f)


def saturation(img, f):
    return blend(img, np.broadcast_to(gray(img), img.shape), f)


def rgb2hsv(img):
    """torchvision _rgb2hsv (functional_tensor), vectorized."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = np.ones_like(maxc)
    s = cr / np.where(eqc, ones, maxc)
    cr_div = np.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = (hr + hg + hb) / 6.0 % 1.0
    return np.stack([h, s, maxc], axis=-1)


def hsv2rgb(hsv):
    """torchvision _hsv2rgb: indexed i = floor(6h) formulation."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(np.int32) % 6
    p = np.clip(v * (1.0 - s), 0.0, 1.0)
    q = np.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = np.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    table_r = np.stack([v, q, p, p, t, v], axis=-1)
    table_g = np.stack([t, v, v, q, p, p], axis=-1)
    table_b = np.stack([p, p, t, v, v, q], axis=-1)
    idx = i[..., None]
    return np.concatenate([
        np.take_along_axis(table_r, idx, axis=-1),
        np.take_along_axis(table_g, idx, axis=-1),
        np.take_along_axis(table_b, idx, axis=-1)], axis=-1)


def hue(img, delta):
    hsv = rgb2hsv(img)
    hsv[..., 0] = (hsv[..., 0] + delta) % 1.0
    return hsv2rgb(hsv)


def solarize_u8(img_u8, threshold=224):
    """torchvision solarize on uint8 (reference RandomSolarize(224) runs
    pre-ToDtype, i.e. on uint8)."""
    return np.where(img_u8 >= threshold, 255 - img_u8.astype(np.int32),
                    img_u8).astype(np.uint8)


def gaussian_blur3(img, sigma):
    """torchvision gaussian_blur(kernel_size=3): 1D kernel from
    pdf = exp(-0.5*((arange(3)-1)/sigma)^2) normalized, separable conv,
    reflect padding."""
    x = np.arange(3, dtype=np.float64) - 1.0
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    k = (pdf / pdf.sum()).astype(np.float32)
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    h = (pad[1:-1, 0:-2] * k[0] + pad[1:-1, 1:-1] * k[1]
         + pad[1:-1, 2:] * k[2])
    hp = np.pad(h, ((1, 1), (0, 0), (0, 0)), mode="reflect")
    return hp[0:-2] * k[0] + hp[1:-1] * k[1] + hp[2:] * k[2]


def normalize(img, mean, std):
    return (img - np.asarray(mean)) / np.asarray(std)


# ---- golden generation -----------------------------------------------------

def main() -> None:
    rng = np.random.default_rng(2006)
    imgs_u8 = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    imgs = imgs_u8.astype(np.float32) / 255.0
    factors = np.asarray([0.5, 0.7, 0.9, 1.0], np.float32)  # U(0.5, 1.0)
    hue_deltas = np.asarray([-0.125, -0.05, 0.05, 0.125], np.float32)
    sigmas = np.asarray([0.1, 0.5, 1.2, 2.0], np.float32)

    out = {"imgs_u8": imgs_u8, "factors": factors,
           "hue_deltas": hue_deltas, "sigmas": sigmas}
    out["grayscale"] = gray(imgs).astype(np.float32)
    out["brightness"] = np.stack(
        [brightness(imgs[i], factors[i]) for i in range(4)]).astype(np.float32)
    out["contrast"] = np.stack(
        [contrast(imgs[i], factors[i]) for i in range(4)]).astype(np.float32)
    out["saturation"] = np.stack(
        [saturation(imgs[i], factors[i]) for i in range(4)]).astype(np.float32)
    out["hue"] = np.stack(
        [hue(imgs[i].astype(np.float64), hue_deltas[i])
         for i in range(4)]).astype(np.float32)
    out["solarize_u8"] = solarize_u8(imgs_u8)
    out["blur"] = np.stack(
        [gaussian_blur3(imgs[i].astype(np.float64), sigmas[i])
         for i in range(4)]).astype(np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out["normalize"] = normalize(imgs, mean, std).astype(np.float32)

    # Op-order coupling (the documented fixed-order deviation): the full
    # jitter chain under all 24 torchvision permutations of
    # (brightness, contrast, saturation, hue) with identical factors.
    import itertools

    ops = {0: lambda x, i: brightness(x, factors[i]),
           1: lambda x, i: contrast(x, factors[i]),
           2: lambda x, i: saturation(x, factors[i]),
           3: lambda x, i: hue(x, hue_deltas[i])}
    perms = list(itertools.permutations(range(4)))
    chain = np.empty((len(perms), 4, 16, 16, 3), np.float32)
    for pi, perm in enumerate(perms):
        for i in range(4):
            x = imgs[i].astype(np.float64)
            for op in perm:
                x = ops[op](x, i)
            chain[pi, i] = x
    out["jitter_perms"] = chain
    # Our fixed order is (brightness, contrast, saturation, hue) = perm 0
    # of itertools (0,1,2,3).
    out["jitter_fixed"] = chain[0]

    # uint8-path chain (what the reference actually computes: every jitter
    # op rounds to uint8 because ToDtype comes last). Quantifies the
    # float-chain deviation our on-device pipeline carries.
    def to_u8(x):
        return np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)

    chain_u8 = np.empty((4, 16, 16, 3), np.uint8)
    for i in range(4):
        x = imgs_u8[i]
        for op in (0, 1, 2, 3):
            x = to_u8(ops[op](x.astype(np.float64) / 255.0, i))
        chain_u8[i] = x
    out["jitter_fixed_u8"] = chain_u8

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
