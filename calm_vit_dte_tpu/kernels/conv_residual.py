"""Fused Pallas TPU kernel: the CALM block's conv residual.

Reference (Vi_Tools_CNN_less_V2.py:379-385): 1x1 conv (3->32) -> exact GELU
-> depthwise 3x3 (zero pad) -> exact GELU -> 1x1 conv (32->3), applied to
the image-shaped (B, S, S, 3) view of the row tokens, result added back.

In XLA this chain makes ~5 HBM round trips of the (B, S, S, 32) hidden
tensor per direction (at batch 128 / S 224 that tensor is 411 MB in bf16).
Fused, the hidden channels never leave VMEM: HBM traffic is exactly
x in + y out. FLOPs are trivial (tiny channel counts) — the op is purely
bandwidth-bound, so the win is the traffic ratio (~5x per direction).

Grid: (B/Bt,). Per step the full (Bt, S, S, 3) image tile and its 32-channel
hidden live in VMEM. The depthwise 3x3 runs as 9 statically-shifted
multiply-accumulates on a zero-padded copy.

Backward recomputes the forward per tile and emits dx per tile plus weight
grads accumulated across the sequential grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 32
_VMEM_LIMIT = 110 * 1024 * 1024
_TILE_BUDGET = 48 * 1024 * 1024


def _pick_bt(b: int, s: int) -> int | None:
    # bt capped at 2: bt=4 at S=80 crashed the axon remote compile helper
    # (empirical sweep; bt<=2 compiles and runs).
    for bt in (2, 1):
        if b % bt:
            continue
        # ~4 live (Bt,S+2,S+2,32) fp32-ish copies, x3 Mosaic slack.
        est = 3 * 4 * 4 * bt * (s + 2) * (s + 2) * HIDDEN
        if est <= _TILE_BUDGET:
            return bt
    return None


def supported(b: int, s: int) -> bool:
    # OFF on the training path: measured end-to-end, fusing only the
    # feasible stages (S<=128 — S=176 crashes the axon remote compiler,
    # S=224 exceeds VMEM) made the step SLOWER (392 ms vs 314 ms at batch
    # 128): at Bt<=2 the small-S kernels run 64+ sequential grid steps and
    # are launch-bound, losing more than the saved HBM traffic. Needs
    # larger batch tiles (blocked on the remote-compiler crash) or spatial
    # tiling to win. Kernel + oracle tests kept as groundwork.
    return False


def _supported_ungated(b: int, s: int) -> bool:
    return _pick_bt(b, s) is not None


def _erf(x):
    x32 = x.astype(jnp.float32)
    sign = jnp.sign(x32)
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return (sign * (1.0 - poly * jnp.exp(-ax * ax))).astype(x.dtype)


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _dgelu(x):
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _dw3x3_into(acc_ref, h, w, *, flip: bool = False):
    """Depthwise 3x3 with zero padding, accumulated INTO a VMEM scratch ref.

    Static slices (Mosaic has no dynamic_slice lowering) but sequential
    ref accumulation: an SSA sum of 9 products keeps every tap's buffer
    live simultaneously — Mosaic's scoped VMEM blew up to 114 MB at
    Bt=1/S=128 that way. flip=True gives the transposed (correlation)
    taps for the backward."""
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    s = h.shape[1]
    first = True
    for a in range(3):
        for b in range(3):
            sa, sb = (2 - a, 2 - b) if flip else (a, b)
            prod = (hp[:, sa:sa + s, sb:sb + s, :].astype(jnp.float32)
                    * w[a, b])
            if first:
                acc_ref[:] = prod
                first = False
            else:
                acc_ref[:] += prod


def _conv1x1(x, w, b, out_c):
    """x: (...,Cin) x w: (Cout,Cin) -> (...,Cout). One pixel-flattened
    matmul: K<=32 wastes MXU lanes but the FLOPs are trivial, and a
    channel-unrolled VPU version keeps Cin product buffers live."""
    flat = x.reshape(-1, x.shape[-1])
    y = jnp.dot(flat, w.T.astype(x.dtype),
                preferred_element_type=jnp.float32)
    return y.reshape(x.shape[:-1] + (out_c,)) + b


def _fwd_parts(x, w1, b1, wd, bd, w2, b2, dtype, acc_ref):
    a1 = _conv1x1(x, w1, b1, HIDDEN)            # (Bt,S,S,32) fp32
    h = _gelu(a1).astype(dtype)
    _dw3x3_into(acc_ref, h, wd)
    a2 = acc_ref[:] + bd
    d = _gelu(a2).astype(dtype)
    y = _conv1x1(d, w2, b2, 3)
    return a1, h, a2, d, y


def _fwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                y_ref, acc_ref, *, dtype):
    x = x_ref[:].astype(dtype)
    _, _, _, _, y = _fwd_parts(x, w1_ref[:], b1_ref[:], wd_ref[:],
                               bd_ref[:], w2_ref[:], b2_ref[:], dtype,
                               acc_ref)
    y_ref[:] = y.astype(dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                g_ref, dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref,
                dw2_ref, db2_ref, acc_ref, acc2_ref, *, dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dbd_ref[:] = jnp.zeros_like(dbd_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:].astype(dtype)
    w1 = w1_ref[:]
    wd = wd_ref[:]
    w2 = w2_ref[:]
    a1, h, a2, d, _ = _fwd_parts(x, w1, b1_ref[:], wd, bd_ref[:], w2,
                                 b2_ref[:], dtype, acc_ref)
    g = g_ref[:].astype(jnp.float32)  # (Bt,S,S,3)

    # y = d @ w2^T + b2  (per-pixel):  dd = g @ w2
    dd = jnp.dot(g.reshape(-1, 3).astype(dtype), w2.astype(dtype),
                 preferred_element_type=jnp.float32).reshape(d.shape)
    gd = g.astype(dtype)
    dc = d.astype(dtype)
    # dw2[c,k] = sum_pixels g[c] * d[k]
    g2 = gd.reshape(-1, 3)
    d2 = dc.reshape(-1, HIDDEN)
    dw2_ref[:] += jax.lax.dot_general(
        g2, d2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g, axis=(0, 1, 2), keepdims=False).reshape(1, 3)

    da2 = dd * _dgelu(a2)
    dbd_ref[:] += jnp.sum(da2, axis=(0, 1, 2)).reshape(1, HIDDEN)
    # dwd[a,b,k] = sum da2[i,j,k] * h[i+a-1, j+b-1, k]: static taps,
    # accumulated straight into the grid-accumulated output ref.
    s = x.shape[1]
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for a in range(3):
        for b in range(3):
            prod = da2 * hp[:, a:a + s, b:b + s, :].astype(jnp.float32)
            dwd_ref[a, b, :] += jnp.sum(prod, axis=(0, 1, 2))
    # dh = transposed depthwise conv (flipped taps), into scratch.
    _dw3x3_into(acc2_ref, da2.astype(dtype), wd, flip=True)
    dh = acc2_ref[:]

    da1 = dh * _dgelu(a1)
    db1_ref[:] += jnp.sum(da1, axis=(0, 1, 2)).reshape(1, HIDDEN)
    # dw1[k,c] = sum da1[k] * x[c]
    da1c = da1.astype(dtype)
    dw1_ref[:] += jax.lax.dot_general(
        da1c.reshape(-1, HIDDEN), x.reshape(-1, 3),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dx = da1 @ w1
    dx = jnp.dot(da1c.reshape(-1, HIDDEN), w1.astype(dtype),
                 preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(x.shape).astype(dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(dtype_name: str, shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, s = shapes
    bt = _pick_bt(b, s)
    if bt is None:
        raise ValueError(f"no feasible batch tile for B={b}, S={s}")

    x_tile = pl.BlockSpec((bt, s, s, 3), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    w_specs = [const((HIDDEN, 3)), const((1, HIDDEN)),
               const((3, 3, HIDDEN)), const((1, HIDDEN)),
               const((3, HIDDEN)), const((1, 3))]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    traffic = 2 * 2 * b * s * s * 3

    acc = pltpu.VMEM((bt, s, s, HIDDEN), jnp.float32)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, dtype=dtype),
        grid=(b // bt,),
        in_specs=[x_tile] + w_specs,
        out_specs=x_tile,
        out_shape=jax.ShapeDtypeStruct((b, s, s, 3), dtype),
        scratch_shapes=[acc],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * HIDDEN * (3 + 9 + 3),
            bytes_accessed=traffic, transcendentals=2 * b * s * s * HIDDEN),
        compiler_params=params, interpret=interpret)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=dtype),
        grid=(b // bt,),
        in_specs=[x_tile] + w_specs + [x_tile],
        out_specs=(x_tile, const((HIDDEN, 3)), const((1, HIDDEN)),
                   const((3, 3, HIDDEN)), const((1, HIDDEN)),
                   const((3, HIDDEN)), const((1, 3))),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, s, 3), dtype),
            jax.ShapeDtypeStruct((HIDDEN, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((3, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        ),
        scratch_shapes=[acc, acc],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * s * s * HIDDEN * (3 + 9 + 3),
            bytes_accessed=2 * traffic,
            transcendentals=4 * b * s * s * HIDDEN),
        compiler_params=params, interpret=interpret)

    @jax.custom_vjp
    def fused(x, w1, b1, wd, bd, w2, b2):
        return fwd_call(x, w1, b1, wd, bd, w2, b2)

    def fwd(x, w1, b1, wd, bd, w2, b2):
        return (fwd_call(x, w1, b1, wd, bd, w2, b2),
                (x, w1, b1, wd, bd, w2, b2))

    def bwd(res, g):
        x, w1, b1, wd, bd, w2, b2 = res
        dx, dw1, db1, dwd, dbd, dw2, db2 = bwd_call(x, w1, b1, wd, bd, w2,
                                                    b2, g)
        return (dx.astype(x.dtype), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dwd.astype(wd.dtype),
                dbd.astype(bd.dtype), dw2.astype(w2.dtype),
                db2.astype(b2.dtype))

    fused.defvjp(fwd, bwd)
    return fused


def fused_conv_residual(x, w1, b1, wd, bd, w2, b2, *, dtype,
                        interpret: bool = False):
    """x: (B,S,S,3). Weights spectral-normalized, kernel-native layouts:
    w1 (32,3) [= OIHW (32,3,1,1) squeezed], wd (3,3,32) [= (32,1,3,3)
    transposed], w2 (3,32), biases as given. Returns the residual term
    (B,S,S,3) in `dtype`."""
    b, s, _, _ = x.shape
    fused = _make_fused(jnp.dtype(dtype).name, (b, s), interpret)
    return fused(x.astype(dtype), w1, b1.reshape(1, HIDDEN), wd,
                 bd.reshape(1, HIDDEN), w2, b2.reshape(1, 3))
