"""Probe: in-kernel (tq, h) -> (h, tq) relayout at flagship sizes — the
operation that would let the attention kernels consume/emit the
projection-natural (b, s, h, d) layout and eliminate the ~17 ms/step of
head-split transposes (VERDICT r2 item 5).

Round-2 result: crashed Mosaic. Round-3 result (this probe, v5e): it now
COMPILES and is correct, but the in-VMEM relayout costs 3.99 ms for
(128,224,12,56) bf16 where XLA's HBM transpose of the same tensor costs
2.94 ms — the sublane-crossing swap on the VPU is slower than the memory
round trip it would save. Structural transpose elimination is therefore a
net LOSS on this toolchain; the XLA transposes (each ~2.4x streaming SoL)
stay."""
import functools, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))), ".jax_cache"))

B, H, S, D = 128, 12, 224, 56
TQ = 224

def kernel(x_ref, o_ref):
    # x block: (1, TQ, H, D) in projection-natural layout;
    # emit (1, H, TQ, D) kernel-natural — the in-VMEM relayout under test.
    x = x_ref[0]                      # (TQ, H, D)
    o_ref[0] = jnp.swapaxes(x, 0, 1)  # (H, TQ, D)

call = pl.pallas_call(
    kernel,
    grid=(B,),
    in_specs=[pl.BlockSpec((1, TQ, H, D), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, H, TQ, D), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, H, TQ, D), jnp.bfloat16),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024))

x = jnp.asarray(np.random.default_rng(0).standard_normal((B, TQ, H, D)),
                jnp.bfloat16)
try:
    import time
    y = jax.jit(call)(x)
    jax.block_until_ready(y)
    ref = jnp.swapaxes(x, 1, 2)
    ok = bool(jnp.all(y == ref))
    t0 = time.perf_counter()
    for _ in range(10):
        y = jax.jit(call)(x)
    jax.block_until_ready(y)
    print(f"COMPILES ok={ok} {(time.perf_counter()-t0)/10*1e3:.2f} ms vs "
          f"XLA transpose:", flush=True)
    jt = jax.jit(lambda a: jnp.swapaxes(a, 1, 2))
    y2 = jt(x); jax.block_until_ready(y2)
    t0 = time.perf_counter()
    for _ in range(10):
        y2 = jt(x)
    jax.block_until_ready(y2)
    print(f"XLA: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
except Exception as e:
    print(f"CRASH: {type(e).__name__}: {str(e)[:300]}", flush=True)
