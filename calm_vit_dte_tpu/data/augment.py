"""On-device (jittable, batched) ImageNet augmentation pipeline.

Reproduces the reference's torchvision chain (reference: CALM_ViT_V2.py:159-170,
duplicated in both distributed trainers):

    Resize(256)                      [host side, fused into JPEG decode]
    RandomCrop(224)
    ColorJitter(brightness=(0.5,1), contrast=(0.5,1), saturation=(0.5,1),
                hue=(-0.125, 0.125))
    RandomSolarize(224)              [uint8-scale threshold, p=0.5]
    RandomHorizontalFlip()           [p=0.5]
    RandomGrayscale()                [p=0.1]
    GaussianBlur(kernel=3, sigma=(0.1, 2.0))
    ToDtype(float32, scale=True)
    grayscale->RGB repeat            [host side: decoder always emits RGB]
    Normalize(ImageNet mean/std)

Everything after the host-side decode+resize runs as one jitted XLA program
on device (the north-star on-device preprocessing pipeline), batched with
per-image random parameters from an explicit key.

Known deviation: torchvision applies the four ColorJitter ops in a random
permutation per image; we apply them in a fixed order (brightness, contrast,
saturation, hue) with identically distributed factors. This changes no
marginal distribution and only the (training-irrelevant) op-order coupling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _grayscale(img: jax.Array) -> jax.Array:
    """ITU-R 601 luma, matching torchvision rgb_to_grayscale."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (0.2989 * r + 0.587 * g + 0.114 * b)[..., None]


def _blend(a: jax.Array, b: jax.Array, f: jax.Array) -> jax.Array:
    return a * f + b * (1.0 - f)


def _adjust_hue(img: jax.Array, delta: jax.Array) -> jax.Array:
    """img in [0,1]; delta in turns (torchvision hue factor)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    safe_c = jnp.where(c == 0, 1.0, c)
    s = jnp.where(maxc == 0, 0.0, c / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(c == 0, 0.0, h)
    h = (h + delta) % 1.0
    # Branchless HSV -> RGB: f(n) = v - c*clip(min(k, 4-k), 0, 1) with
    # k = (n + 6h) mod 6. (jnp.choose lowers to a gather that cost ~100 ms
    # per channel per step on TPU — measured; this is pure VPU math.)
    cc = s * v

    def comp(n):
        kk = (n + h * 6.0) % 6.0
        return v - cc * jnp.clip(jnp.minimum(kk, 4.0 - kk), 0.0, 1.0)

    return jnp.stack([comp(5.0), comp(3.0), comp(1.0)], axis=-1)


def _gaussian_blur3(img: jax.Array, sigma: jax.Array) -> jax.Array:
    """3x3 separable Gaussian with per-image sigma, reflect padding
    (torchvision GaussianBlur(kernel_size=3))."""
    x = jnp.exp(-0.5 * (1.0 / sigma) ** 2)
    k = jnp.stack([x, jnp.ones_like(x), x], axis=-1)
    k = k / jnp.sum(k, axis=-1, keepdims=True)  # (B, 3)
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Horizontal then vertical pass via gathered weighted sums (cheap for
    # kernel 3; avoids per-image conv kernels).
    kb = k[:, None, None, :]
    h = (pad[:, 1:-1, 0:-2, :] * kb[..., 0, None]
         + pad[:, 1:-1, 1:-1, :] * kb[..., 1, None]
         + pad[:, 1:-1, 2:, :] * kb[..., 2, None])
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    v = (hp[:, 0:-2, :, :] * kb[..., 0, None]
         + hp[:, 1:-1, :, :] * kb[..., 1, None]
         + hp[:, 2:, :, :] * kb[..., 2, None])
    return v


def _random_crop(key: jax.Array, images: jax.Array,
                 out_size: int) -> jax.Array:
    b, h, w, c = images.shape
    ky, kx = jax.random.split(key)
    tops = jax.random.randint(ky, (b,), 0, h - out_size + 1)
    lefts = jax.random.randint(kx, (b,), 0, w - out_size + 1)

    # Two axis-aligned take_along_axis gathers (whole rows, then whole
    # columns) instead of vmap(dynamic_slice): inside the cls-256 train
    # step XLA lowered the vmapped slice to a rolled per-image
    # gather + dynamic-update-slice loop costing ~75 ms/step (~20% of the
    # step; profiled 2026-08-21, u8[128,292,292,3] -> 256 crop). The
    # axis-wise form keeps every gathered slice contiguous and lowers to
    # two plain gathers. Same randint draws from the same keys -> crop
    # selection and output are bit-identical to the previous formulation.
    rows = tops[:, None] + jnp.arange(out_size)          # (b, out)
    cols = lefts[:, None] + jnp.arange(out_size)         # (b, out)
    x = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)


def augment_batch(key: jax.Array, images_u8: jax.Array,
                  crop: int = 224) -> jax.Array:
    """images_u8: (B, 256, 256, 3) uint8 RGB -> (B, crop, crop, 3) fp32
    normalized. Fully jittable; per-image randomness from `key`."""
    b = images_u8.shape[0]
    keys = jax.random.split(key, 10)
    img = _random_crop(keys[0], images_u8, crop).astype(jnp.float32)

    # ColorJitter on the [0,1] scale (torchvision converts internally).
    img = img / 255.0
    fb = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=0.5, maxval=1.0)
    img = jnp.clip(img * fb, 0.0, 1.0)
    fc = jax.random.uniform(keys[2], (b, 1, 1, 1), minval=0.5, maxval=1.0)
    mean_gray = jnp.mean(_grayscale(img), axis=(1, 2, 3),
                         keepdims=True)
    img = jnp.clip(_blend(img, mean_gray, fc), 0.0, 1.0)
    fs = jax.random.uniform(keys[3], (b, 1, 1, 1), minval=0.5, maxval=1.0)
    img = jnp.clip(_blend(img, _grayscale(img), fs), 0.0, 1.0)
    fh = jax.random.uniform(keys[4], (b, 1, 1, 1), minval=-0.125,
                            maxval=0.125)
    img = _adjust_hue(img, fh[..., 0])

    # RandomSolarize(threshold=224/255, p=0.5).
    do_sol = jax.random.bernoulli(keys[5], 0.5, (b, 1, 1, 1))
    img = jnp.where(do_sol & (img >= 224.0 / 255.0), 1.0 - img, img)

    # RandomHorizontalFlip(p=0.5).
    do_flip = jax.random.bernoulli(keys[6], 0.5, (b, 1, 1, 1))
    img = jnp.where(do_flip, img[:, :, ::-1, :], img)

    # RandomGrayscale(p=0.1).
    do_gray = jax.random.bernoulli(keys[7], 0.1, (b, 1, 1, 1))
    img = jnp.where(do_gray, jnp.repeat(_grayscale(img), 3, axis=-1), img)

    # GaussianBlur(kernel=3, sigma~U(0.1, 2.0)), always applied.
    sigma = jax.random.uniform(keys[8], (b,), minval=0.1, maxval=2.0)
    img = _gaussian_blur3(img, sigma)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img - mean) / std


def eval_preprocess(images_u8: jax.Array, crop: int = 224) -> jax.Array:
    """Deterministic eval path: center crop + normalize."""
    b, h, w, c = images_u8.shape
    top = (h - crop) // 2
    left = (w - crop) // 2
    img = images_u8[:, top:top + crop, left:left + crop, :]
    img = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img - mean) / std
