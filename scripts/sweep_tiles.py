"""On-chip attention tile autotune (VERDICT r3 item 6).

Discovers every fused-attention shape a config's train step dispatches
(by recording masked_rope_attention calls under jax.eval_shape — no
compile), then times candidate (batch-tile, query-tile) pairs for each
shape on the real chip (fwd+bwd through the production rope-fused kernel)
and records the winners in kernels/tile_cache.json, which the dispatchers
consult before the conservative 3x-slack analytic estimator
(kernels/axial_attention._tuned_tiles).

Candidates that crash the Mosaic/remote compiler are skipped (recorded as
failures) — the cache only ever contains tiles that compiled AND won.

  python scripts/sweep_tiles.py --config imagenet-cls-256 --batch 128
  python scripts/sweep_tiles.py --shapes 128,12,256,64,64,128  # b,h,s,dc,dr,dv
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CACHE = (pathlib.Path(__file__).resolve().parents[1] / "calm_vit_dte_tpu"
         / "kernels" / "tile_cache.json")


def discover_shapes(config: str, batch: int) -> list[tuple]:
    """All (b, h, s, dc, dr, dv) attention shapes in one train step."""
    import calm_vit_dte_tpu.models.vmla as vmla_mod
    from calm_vit_dte_tpu.data.pipeline import (
        make_cls_preprocess,
        make_reg_preprocess,
    )
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config(config)
    shapes: set[tuple] = set()
    orig = vmla_mod.masked_rope_attention

    def recorder(qc, qr, kc, kr, v, *a, **kw):
        b, h, s, dr = qr.shape
        dc = qc.shape[-1] if qc is not None else 0
        if kr.shape[2] == s:  # fused kernel requires sq == skv
            shapes.add((b, h, s, dc, dr, v.shape[-1]))
        return orig(qc, qr, kc, kr, v, *a, **kw)

    vmla_mod.masked_rope_attention = recorder
    try:
        params, sn_state = vit_init(cfg.model,
                                    jax.random.PRNGKey(cfg.init_seed))
        tx = make_optimizer(cfg.lr, epochs=1, steps_per_epoch=10)
        state = create_train_state(params, sn_state, tx,
                                   jax.random.PRNGKey(1))
        pre = (make_cls_preprocess(cfg.model.out_features, cfg.crop)
               if cfg.task == "cls" else make_reg_preprocess(cfg.crop))
        step = make_train_step(cfg.model, tx, cfg.task, dtype=jnp.bfloat16,
                               remat=False, preprocess=pre)
        batch_spec = {
            "image": jax.ShapeDtypeStruct(
                (batch, cfg.image_size, cfg.image_size, 3), jnp.uint8),
            "label": jax.ShapeDtypeStruct((batch,), jnp.int32)}
        jax.eval_shape(step, state, batch_spec)
    finally:
        vmla_mod.masked_rope_attention = orig
    return sorted(shapes)


def candidates(b: int, s: int) -> list[tuple[int, int]]:
    out = []
    for bt in (1, 2, 4, 8, 16):
        if b % bt:
            continue
        for tq in (64, 128, 256, 512):
            if tq <= s and s % tq == 0:
                out.append((bt, tq))
        if s <= 512:
            out.append((bt, s))
    return sorted(set(out))


def time_candidate(shape: tuple, tile: tuple[int, int],
                   iters: int = 10) -> float:
    """fwd+bwd ms for the rope-fused kernel under a forced tile, via the
    donated-chain harness (_bench_util.time_chained) — independent
    dispatches are elided / round-trip-dominated on this remote runtime,
    so primals are threaded with their own grads between iterations."""
    from _bench_util import time_chained

    from calm_vit_dte_tpu.kernels import axial_attention as ka

    b, h, s, dc, dr, dv = shape
    ka._TILE_OVERRIDE.clear()
    ka._TILE_OVERRIDE[("rope", b, h, s, dc, dr, dv)] = tile
    ka._make_rope_fused.cache_clear()
    ka._make_fused.cache_clear()

    rng = np.random.default_rng(0)

    def mk(*shp):
        return jnp.asarray(rng.standard_normal(shp) * 0.3, jnp.float32)

    qc = mk(b, h, s, dc) if dc else None
    qr, kr = mk(b, h, s, dr), mk(b, h, s, dr)
    kc = mk(b, h, s, dc) if dc else None
    v = mk(b, h, s, dv)
    w1, b1 = mk(2 * s, s) * 0.1, jnp.zeros((2 * s,), jnp.float32)
    w2, b2 = mk(s, 2 * s) * 0.1, jnp.zeros((s,), jnp.float32)
    t = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10.0 ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
    fr = jnp.concatenate([jnp.outer(t, inv)] * 2, axis=-1)
    cq, sq_, ck, sk = jnp.cos(fr), jnp.sin(fr), jnp.cos(1.1 * fr), \
        jnp.sin(1.1 * fr)
    scale = 1.0 / ((dc + dr) ** 0.5)
    args = tuple(a for a in (qc, qr, kc, kr, v, cq, sq_, ck, sk, w1, w2)
                 if a is not None)

    def loss(*a):
        it = iter(a)
        aqc = next(it) if dc else None
        aqr = next(it)
        akc = next(it) if dc else None
        akr = next(it)
        av, acq, asq, ack, ask, aw1, aw2 = (next(it) for _ in range(7))
        o = ka.fused_rope_attention(aqc, aqr, akc, akr, av, acq, asq,
                                    ack, ask, aw1, b1, aw2, b2,
                                    scale=scale, dtype=jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=tuple(range(len(args))))

    def step(a):
        grads = g(*a)
        return tuple(x + 1e-6 * dx.astype(x.dtype)
                     for x, dx in zip(a, grads))

    try:
        return time_chained(step, args, iters=iters) * 1e3
    finally:
        ka._TILE_OVERRIDE.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--shapes", default=None,
                    help="comma-sep b,h,s,dc,dr,dv (semicolon-sep list)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dry-run", action="store_true",
                    help="print discovered shapes and exit")
    ap.add_argument("--skip-cached", action="store_true",
                    help="skip shapes already in tile_cache.json "
                         "(resume an interrupted sweep)")
    args = ap.parse_args()

    if args.shapes:
        shapes = [tuple(int(x) for x in grp.split(","))
                  for grp in args.shapes.split(";")]
    else:
        shapes = discover_shapes(args.config or "imagenet-cls-224",
                                 args.batch)
    print(f"shapes to sweep: {shapes}", flush=True)
    if args.dry_run:
        return

    from calm_vit_dte_tpu.kernels import axial_attention as ka

    cache = {}
    if CACHE.exists():
        cache = json.loads(CACHE.read_text())
    for shape in shapes:
        b, h, s, dc, dr, dv = shape
        if args.skip_cached and \
                ("rope|" + ",".join(map(str, shape))) in cache:
            print(f"  {shape}: cached, skipping", flush=True)
            continue
        default = ka._pick_tiles_rope(b, h, s, dc, dr, dv)
        results = {}
        for tile in candidates(b, s):
            try:
                ms = time_candidate(shape, tile, iters=args.iters)
                results[tile] = ms
                print(f"  {shape} tile={tile}: {ms:.2f} ms", flush=True)
            except Exception as e:
                print(f"  {shape} tile={tile}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        if not results:
            print(f"  {shape}: no candidate compiled; estimator stays",
                  flush=True)
            continue
        best_tile = min(results, key=results.get)
        key = "rope|" + ",".join(map(str, shape))
        cache[key] = {"tile": list(best_tile),
                      "ms": round(results[best_tile], 3),
                      "default_tile": list(default) if default else None,
                      "default_ms": round(results.get(default,
                                                      float("nan")), 3)
                      if default in results else None,
                      "n_candidates": len(results)}
        print(f"  {shape}: winner {best_tile} at "
              f"{results[best_tile]:.2f} ms (estimator pick {default})",
              flush=True)
        CACHE.write_text(json.dumps(cache, indent=1, sort_keys=True))
    print(f"wrote {CACHE}", flush=True)


if __name__ == "__main__":
    main()
