"""On-TPU check of the rope-fused attention kernel (fwd+grads vs oracle)
and a quick full-step timing. Ad-hoc; bench.py carries the permanent check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def check_kernel():
    import math

    from calm_vit_dte_tpu.kernels.axial_attention import fused_rope_attention
    from calm_vit_dte_tpu.ops.attention import _attention_core

    rng = np.random.default_rng(7)
    b, h, s, dc = 4, 12, 128, 28
    dr = 28
    d = dc + dr

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    qc, kc = mk(b, h, s, dc), mk(b, h, s, dc)
    qr, kr = mk(b, h, s, dr), mk(b, h, s, dr)
    v = mk(b, h, s, d)
    w1 = mk(2 * s, s) * 0.15
    b1 = jnp.zeros((2 * s,))
    w2 = mk(s, 2 * s) * 0.15
    b2 = jnp.zeros((s,))
    t = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10.0 ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
    fr = jnp.concatenate([jnp.outer(t, inv)] * 2, axis=-1)
    cq, sq, ck, sk = jnp.cos(fr), jnp.sin(fr), jnp.cos(1.1 * fr), jnp.sin(1.1 * fr)
    scale = 1.0 / math.sqrt(d)

    def rot(x, c, s_):
        half = x.shape[-1] // 2
        rh = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * c + rh * s_

    def loss_oracle(qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
        q = jnp.concatenate([qc, rot(qr, cq, sq)], -1)
        k = jnp.concatenate([kc, rot(kr, ck, sk)], -1)
        o = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                            dtype=jnp.float32, use_mask=True)
        return jnp.sum(o * o)

    def loss_fused(qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
        o = fused_rope_attention(qc, qr, kc, kr, v, cq, sq, ck, sk,
                                 w1, b1, w2, b2, scale=scale,
                                 dtype=jnp.float32)
        return jnp.sum(o * o)

    args = (qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2)
    an = tuple(range(13))
    lf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=an))(*args)
    lo, go = jax.jit(jax.value_and_grad(loss_oracle, argnums=an))(*args)
    np.testing.assert_allclose(float(lf), float(lo), rtol=2e-4)
    names = "qc qr kc kr v cq sq ck sk w1 b1 w2 b2".split()
    for n, a_, b_ in zip(names, gf, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3, err_msg=n)
    print("rope kernel on-TPU: fused == oracle (fwd + all 13 grads)",
          flush=True)


def time_step(bs=128):
    from calm_vit_dte_tpu.data.pipeline import make_cls_preprocess
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config("imagenet-cls-224")
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        cfg.epochs, steps_per_epoch=1000)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(0, 256, (bs, 256, 256, 3),
                                          dtype=np.uint8)),
        "label": jnp.asarray(rng.integers(0, 1000, (bs,), dtype=np.int32)),
    }
    step_fn = make_train_step(cfg.model, tx, "cls", dtype=jnp.bfloat16,
                              remat=False,
                              preprocess=make_cls_preprocess(1000, 224))
    js = jax.jit(step_fn, donate_argnums=0)
    st, m = js(state, batch)
    jax.block_until_ready(st.params)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            st, m = js(st, batch)
        jax.block_until_ready(st.params)
        times.append((time.perf_counter() - t0) / 5)
    p50 = float(np.percentile(times, 50))
    print(f"full step: {p50*1e3:.1f} ms ({bs/p50:.1f} img/s), "
          f"loss={float(m['loss']):.3f}", flush=True)


if __name__ == "__main__":
    check_kernel()
    time_step(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
