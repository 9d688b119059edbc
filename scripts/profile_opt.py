"""Ad-hoc: where do the optimizer's ~28 ms/step go? Times optax variants
plus the step's grad_norm metric on flagship-sized trees on the real chip."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import time_chained
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main():
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import (
        cosine_per_epoch_schedule, make_optimizer,
    )
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config("imagenet-cls-224")
    params, _ = vit_init(cfg.model, jax.random.PRNGKey(0))
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.2f}M params", flush=True)
    grads = jax.tree.map(
        lambda x: jnp.full_like(x, 1e-4), params)

    def bench_tx(name, tx, with_metric=False):
        opt_state = jax.jit(tx.init)(params)

        def step(a):
            g, s, p = a
            u, ns = tx.update(g, s, p)
            newp = optax.apply_updates(p, u)
            if with_metric:
                gn = optax.global_norm(g)
                newp = jax.tree.map(
                    lambda x: x + (gn * 1e-30).astype(x.dtype)
                    if x.ndim > 0 else x, newp)
            g2 = jax.tree.map(
                lambda gg, pp: gg + pp.astype(gg.dtype) * 1e-30, g, newp)
            return (g2, ns, newp)

        t = time_chained(step, (grads, opt_state, params))
        print(f"{name:44s} {t*1e3:7.2f} ms", flush=True)

    base = lambda: optax.chain(  # noqa: E731
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=cosine_per_epoch_schedule(3.1e-3, 65, 1000),
                    b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.02))

    bench_tx("current (flatten+if_finite+clip+adamw)", make_optimizer())
    bench_tx("  + global_norm(grads) metric", make_optimizer(),
             with_metric=True)
    bench_tx("flatten(clip+adamw) [no if_finite]", optax.flatten(base()))
    bench_tx("if_finite(clip+adamw) [no flatten]",
             optax.apply_if_finite(base(), 100))
    bench_tx("clip+adamw bare", base())


if __name__ == "__main__":
    main()
