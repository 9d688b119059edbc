"""Ad-hoc step-time breakdown on the real chip: times the full train step
and its pieces (preprocess, forward, forward+backward, optimizer) so
optimization work targets what is actually hot. Not part of the test suite.

Usage: python scripts/profile_step.py [batch_size]
"""

from __future__ import annotations

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


def timeit(fn, *args, iters=10, chain=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(max(1, iters // chain)):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.percentile(times, 50))


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from calm_vit_dte_tpu.data.pipeline import make_cls_preprocess
    from calm_vit_dte_tpu.models.vit import vit_apply, vit_init
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree, prenormalized_scope,
    )
    from calm_vit_dte_tpu.train.losses import softmax_cross_entropy
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
    imgs = jnp.asarray(rng.integers(0, 256, (bs, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 1000, (bs,), dtype=np.int32))
    batch = {"image": imgs, "label": labels}
    pre = make_cls_preprocess(1000, 224)
    key = jax.random.PRNGKey(2)

    dtype = jnp.bfloat16

    # 1. preprocess only
    jp = jax.jit(pre)
    t_pre = timeit(jp, key, batch)
    print(f"preprocess:            {t_pre*1e3:8.1f} ms", flush=True)
    pbatch = jax.block_until_ready(jp(key, batch))

    # 2. sn normalize_tree only
    def normed(params, sn_state):
        return normalize_tree(params, sn_state, training=True)
    jn = jax.jit(normed)
    t_sn = timeit(jn, state.params, state.sn_state)
    print(f"sn normalize_tree:     {t_sn*1e3:8.1f} ms", flush=True)
    norm_params, _ = jax.block_until_ready(jn(state.params, state.sn_state))

    # 3. forward only (train mode, prenormalized)
    def fwd(norm_params, sn_state, x):
        with prenormalized_scope():
            out, kl, _ = vit_apply(cfg.model, norm_params, sn_state, x,
                                   training=True, rng=key, dtype=dtype)
        return softmax_cross_entropy(out, pbatch["label"]), kl
    jf = jax.jit(fwd)
    t_fwd = timeit(jf, norm_params, state.sn_state, pbatch["image"])
    print(f"forward (train):       {t_fwd*1e3:8.1f} ms", flush=True)

    # 4. forward+backward (no optimizer)
    def fwdbwd(norm_params, sn_state, x):
        def loss_fn(p):
            with prenormalized_scope():
                out, kl, _ = vit_apply(cfg.model, p, sn_state, x,
                                       training=True, rng=key, dtype=dtype)
            return softmax_cross_entropy(out, pbatch["label"])
        return jax.grad(loss_fn)(norm_params)
    jb = jax.jit(fwdbwd)
    t_bwd = timeit(jb, norm_params, state.sn_state, pbatch["image"])
    print(f"forward+backward:      {t_bwd*1e3:8.1f} ms", flush=True)
    grads = jax.block_until_ready(jb(norm_params, state.sn_state,
                                     pbatch["image"]))

    # 5. optimizer only
    def opt(grads, opt_state, params):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt
    jo = jax.jit(opt)
    t_opt = timeit(jo, grads, state.opt_state, state.params)
    print(f"optimizer:             {t_opt*1e3:8.1f} ms", flush=True)

    # 6. full step, remat off and on
    for remat in (False, True):
        step_fn = make_train_step(cfg.model, tx, "cls", dtype=dtype,
                                  remat=remat,
                                  preprocess=make_cls_preprocess(1000, 224))
        js = jax.jit(step_fn, donate_argnums=0)
        st = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
        st, m = js(st, batch)
        jax.block_until_ready(st.params)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                st, m = js(st, batch)
            jax.block_until_ready(st.params)
            times.append((time.perf_counter() - t0) / 5)
        t_full = float(np.percentile(times, 50))
        print(f"full step (remat={remat!s:5}): {t_full*1e3:6.1f} ms "
              f"({bs/t_full:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
