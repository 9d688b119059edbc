"""Benchmark: CALM-ViT-V2 ImageNet-1k 224px classification training
throughput on the local TPU chip(s).

Prints ONE JSON line:
  {"metric": "imagenet224_cls_train_images_per_sec_per_chip",
   "value": N, "unit": "images/sec/chip", "vs_baseline": R, ...}

The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the first recorded TPU measurement (bench_baseline.json, written on
first successful run) — i.e. it tracks improvement across rounds; 1.0 on the
round that establishes the baseline.

The measured step is the full production train step: uint8 batch ->
on-device augmentation + CutMix/MixUp -> bf16 forward/backward (fused Pallas
axial attention) -> AdamW update, jitted as one XLA program.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
METRIC = "imagenet224_cls_train_images_per_sec_per_chip"


def kernel_regression_check() -> None:
    """On-TPU fused-kernel-vs-XLA-oracle assert (fwd + grads) on a small
    flagship-like shape, run before timing so a Mosaic/toolchain regression
    fails the bench loudly instead of silently degrading (VERDICT r1 #7)."""
    from calm_vit_dte_tpu.kernels.axial_attention import (
        fused_masked_attention,
    )
    from calm_vit_dte_tpu.ops.attention import _attention_core

    rng = np.random.default_rng(7)
    b, h, s, d = 4, 12, 128, 56
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3,
                           jnp.float32) for _ in range(3))
    w1 = jnp.asarray(rng.standard_normal((2 * s, s)) * 0.05, jnp.float32)
    b1 = jnp.zeros((2 * s,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((s, 2 * s)) * 0.05, jnp.float32)
    b2 = jnp.zeros((s,), jnp.float32)
    scale = 1.0 / (d ** 0.5)

    def loss_fused(q, k, v, w1, b1, w2, b2):
        o = fused_masked_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                   dtype=jnp.float32)
        return jnp.sum(o * o)

    def loss_oracle(q, k, v, w1, b1, w2, b2):
        o = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                            dtype=jnp.float32, use_mask=True)
        return jnp.sum(o * o)

    args = (q, k, v, w1, b1, w2, b2)
    lf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3)))(
        *args)
    lo, go = jax.jit(jax.value_and_grad(loss_oracle, argnums=(0, 1, 2, 3)))(
        *args)
    np.testing.assert_allclose(float(lf), float(lo), rtol=2e-4)
    for a, b_ in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3)

    # The rope-fused kernel IS the production path (models/vmla.py): check
    # it too — in-kernel rotation + concat + learned-table grads.
    from calm_vit_dte_tpu.kernels.axial_attention import (
        fused_rope_attention,
    )

    dc = d // 2
    qc, kc = q[..., :dc], k[..., :dc]
    qr, kr = q[..., dc:], k[..., dc:]
    t = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10.0 ** (jnp.arange(0, dc, 2, jnp.float32) / dc))
    fr = jnp.concatenate([jnp.outer(t, inv)] * 2, axis=-1)
    cq, sq_, ck, sk = (jnp.cos(fr), jnp.sin(fr),
                       jnp.cos(1.1 * fr), jnp.sin(1.1 * fr))

    def rot(x, c, s_):
        half = x.shape[-1] // 2
        rh = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * c + rh * s_

    def loss_rope_fused(qc, qr, kc, kr, cq, sq_, ck, sk):
        o = fused_rope_attention(qc, qr, kc, kr, v, cq, sq_, ck, sk,
                                 w1, b1, w2, b2, scale=scale,
                                 dtype=jnp.float32)
        return jnp.sum(o * o)

    def loss_rope_oracle(qc, qr, kc, kr, cq, sq_, ck, sk):
        qq = jnp.concatenate([qc, rot(qr, cq, sq_)], -1)
        kk = jnp.concatenate([kc, rot(kr, ck, sk)], -1)
        o = _attention_core(qq, kk, v, w1, b1, w2, b2, scale=scale,
                            dtype=jnp.float32, use_mask=True)
        return jnp.sum(o * o)

    rargs = (qc, qr, kc, kr, cq, sq_, ck, sk)
    an = tuple(range(8))
    lrf, grf = jax.jit(jax.value_and_grad(loss_rope_fused, argnums=an))(
        *rargs)
    lro, gro = jax.jit(jax.value_and_grad(loss_rope_oracle, argnums=an))(
        *rargs)
    np.testing.assert_allclose(float(lrf), float(lro), rtol=2e-4)
    for a, b_ in zip(grf, gro):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=5e-3)
    print("kernel regression check: fused == oracle (fwd+grads, "
          "plain + rope-fused)", file=sys.stderr, flush=True)


def build_step(batch_size: int, remat: bool = True,
               microbatches: int = 1, config: str = "imagenet-cls-224"):
    from calm_vit_dte_tpu.data.pipeline import (
        make_cls_preprocess,
        make_reg_preprocess,
    )
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding,
    )
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config(config)
    mesh = make_mesh()
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        cfg.epochs, steps_per_epoch=1000)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated_sharding(mesh))

    pre = (make_cls_preprocess(cfg.model.out_features, cfg.crop)
           if cfg.task == "cls" else make_reg_preprocess(cfg.crop))
    step_fn = make_train_step(cfg.model, tx, cfg.task, dtype=jnp.bfloat16,
                              remat=remat, preprocess=pre,
                              microbatches=microbatches)
    jit_step = jax.jit(step_fn, donate_argnums=0)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch_size, cfg.image_size, cfg.image_size,
                                 3), dtype=np.uint8)
    labels = rng.integers(0, max(cfg.model.out_features, 2), (batch_size,),
                          dtype=np.int32)
    sh = batch_sharding(mesh)
    batch = {"image": jax.device_put(imgs, sh),
             "label": jax.device_put(labels, sh)}
    return state, batch, jit_step


def step_flops(jit_step, state, batch) -> float | None:
    """FLOPs of the compiled train step from XLA cost analysis (includes the
    Pallas kernels via their CostEstimates)."""
    try:
        analysis = jit_step.lower(state, batch).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost analysis unavailable: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr, flush=True)
        return None


def measure(batch_size: int, warmup: int = 3, iters: int = 20,
            remat: bool = True, microbatches: int = 1,
            config: str = "imagenet-cls-224"):
    state, batch, jit_step = build_step(batch_size, remat, microbatches,
                                        config=config)
    state, metrics = jit_step(state, batch)  # compile + first step
    # The executable now exists, so lower+compile for cost analysis hits the
    # cache instead of recompiling.
    flops = step_flops(jit_step, state, batch)
    for _ in range(max(warmup - 1, 0)):
        state, metrics = jit_step(state, batch)
    # Block on the UPDATED STATE, not the loss: the loss materializes after
    # the forward and (on runtimes that stream outputs) blocking on it can
    # return before the backward/update execute — observed as an absurd
    # 4.4 ms/step reading.
    jax.block_until_ready(state.params)
    # Time CHAINS of steps, blocking once per chain: the production trainer
    # never blocks per step (async dispatch pipelines on device), and the
    # remote-runtime round trip here measures ~26 ms per blocking call —
    # per-step blocking would charge that to every step. Per-chain mean,
    # median across chains. Correctness unchanged: every step in a chain
    # must complete before the final state materializes.
    chain = 5
    n_chains = max(1, iters // chain)
    times = []
    losses = []
    for _ in range(n_chains):
        t0 = time.perf_counter()
        for _ in range(chain):
            state, metrics = jit_step(state, batch)
            losses.append(metrics["loss"])
        jax.block_until_ready(state.params)
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(times, 50))
    losses = [float(x) for x in losses]
    if not all(np.isfinite(losses)):
        raise RuntimeError(f"non-finite losses during bench: {losses}")
    n_chips = jax.device_count()
    mfu = None
    if flops:
        from calm_vit_dte_tpu.utils.profiling import chip_peak_tflops

        # XLA cost analysis counts a lax.scan body ONCE regardless of trip
        # count; the grad-accumulation scan runs it `microbatches` times
        # (the non-scan remainder — one optimizer update — is negligible).
        flops *= microbatches
        mfu = flops / p50 / n_chips / (chip_peak_tflops() * 1e12)
    return batch_size / p50 / n_chips, p50, losses[-1], mfu


def measure_reconstruct(batch_size: int, warmup: int = 3, iters: int = 20):
    """Reg serving throughput: the Predictor.reconstruct() forward (the
    reference's sample-generation path, CALM_ViT_V2.py:113-118) on the
    imagenet-reg-224 model, jitted predict timed like measure_eval."""
    from calm_vit_dte_tpu.serve import Predictor

    p = Predictor.fresh("imagenet-reg-224")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch_size, 256, 256, 3),
                                    dtype=np.uint8))
    out, _ = p._predict(p.params, p.sn_state, imgs)  # compile
    jax.block_until_ready(out)
    for _ in range(max(warmup - 1, 0)):
        out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    chain = 5
    n_chains = max(1, iters // chain)
    times = []
    for _ in range(n_chains):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, _ = p._predict(p.params, p.sn_state, imgs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(times, 50))
    if not np.all(np.isfinite(np.asarray(out))):
        raise RuntimeError("non-finite reconstruct output during bench")
    return batch_size / p50 / jax.device_count(), p50


def measure_eval(batch_size: int, warmup: int = 3, iters: int = 20):
    """Eval/serving throughput on the flagship model: the serve.Predictor
    path (weights spectral-normalized once and frozen, uint8 input, on-device
    center-crop preprocessing, bf16 forward), timed with the same chained
    dispatch as the train measurement. BASELINE.json's headline metric is
    train + eval throughput (reference eval loop: CALM_ViT_V2.py:227-240);
    this puts the eval half in the driver-recorded bench."""
    from calm_vit_dte_tpu.serve import Predictor

    p = Predictor.fresh("imagenet-cls-224")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch_size, 256, 256, 3),
                                    dtype=np.uint8))
    out, _ = p._predict(p.params, p.sn_state, imgs)  # compile
    jax.block_until_ready(out)
    for _ in range(max(warmup - 1, 0)):
        out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    chain = 5
    n_chains = max(1, iters // chain)
    times = []
    for _ in range(n_chains):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, _ = p._predict(p.params, p.sn_state, imgs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(times, 50))
    if not np.all(np.isfinite(np.asarray(out))):
        raise RuntimeError("non-finite eval logits during bench")
    return batch_size / p50 / jax.device_count(), p50


def main() -> None:
    last_err = None
    # Known-good configuration first so a result always lands quickly;
    # BENCH_BS=N overrides (bs=256 currently trips a remote-compiler crash
    # upstream). remat off fits at these batch sizes (the fused attention
    # keeps scores out of HBM) and skips the ~85 ms forward replay.
    # Grad-accumulation first: the 4x128 scan amortizes the optimizer pass
    # and per-step dispatch across 512 images (625.2 img/s vs 592.2 at the
    # monolithic bs=128 — and the reference's own regime is large-batch,
    # 484/rank). Fallback chain shrinks until something fits/compiles.
    attempts = [(512, False, 4), (128, False, 1), (128, True, 1),
                (64, False, 1), (64, True, 1), (32, True, 1), (16, True, 1),
                (8, True, 1)]
    if os.environ.get("BENCH_BS"):
        # BENCH_MICRO=k splits BENCH_BS into k grad-accumulation
        # microbatches (lax.scan) — how the reference's per-chip batch 484
        # runs within this environment's compiler limits.
        attempts = [(int(os.environ["BENCH_BS"]),
                     os.environ.get("BENCH_REMAT", "0") == "1",
                     int(os.environ.get("BENCH_MICRO", "1")))] + attempts
    try:
        kernel_regression_check()
    except AssertionError as e:
        print(json.dumps({"metric": METRIC, "value": 0.0,
                          "unit": "images/sec/chip", "vs_baseline": 0.0,
                          "error": f"kernel regression: {str(e)[:300]}"}))
        return
    except Exception as e:  # CPU-only env etc.: check not applicable
        print(f"kernel check skipped: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
    for bs, remat, micro in attempts:
        try:
            ips, p50, loss, mfu = measure(bs, remat=remat,
                                          microbatches=micro)
            if mfu is not None and mfu > 0.6:
                # Physically impossible for this model (component floors,
                # NOTES.md) — a corrupted timing (observed once under heavy
                # host contention: chain dispatch returned early). Re-run.
                print(f"implausible mfu {mfu:.3f}; re-measuring",
                      file=sys.stderr, flush=True)
                ips, p50, loss, mfu = measure(bs, remat=remat,
                                              microbatches=micro)
            break
        except Exception as e:  # OOM or compile failure: shrink
            print(f"batch {bs} (remat={remat}, micro={micro}) failed: "
                  f"{type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
            last_err = e
            continue
    else:
        print(json.dumps({"metric": METRIC, "value": 0.0,
                          "unit": "images/sec/chip", "vs_baseline": 0.0,
                          "error": str(last_err)[:400]}))
        return

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("value"):
            vs = ips / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": METRIC, "value": ips,
                       "recorded": time.strftime("%Y-%m-%d")}, f)

    out = {
        "metric": METRIC,
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 4),
        "p50_step_time_s": round(p50, 4),
        "batch_size": bs,
        "n_chips": jax.device_count(),
        "backend": jax.default_backend(),
    }
    if micro > 1:
        out["microbatches"] = micro
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    # BASELINE.json's headline metric is train + eval throughput; the eval
    # half rides the serve path. Failures here must not lose the train
    # number already measured.
    # bs=128 beats 256 reproducibly (1915.7 vs 1879.4 img/s same-session,
    # r3; matches the quantize A/B table) — the batch-256 forward pays
    # more in HBM pressure than it saves in dispatch amortization.
    for ebs in (128, 256, 64):
        try:
            eips, ep50 = measure_eval(ebs)
            out["eval_images_per_sec_per_chip"] = round(eips, 2)
            out["eval_p50_step_time_s"] = round(ep50, 4)
            out["eval_batch_size"] = ebs
            break
        except Exception as e:
            print(f"eval bench bs={ebs} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)
    # Second workload (VERDICT r3 item 5): the reg/reconstruction trainer
    # (Huber + 0.1*KL, reference distributed_trainer_reg.py) and its
    # serving path, in the official artifact instead of only NOTES.md.
    # BENCH_SKIP_REG=1 skips it (halves bench wall time when iterating).
    if os.environ.get("BENCH_SKIP_REG") != "1":
        for rbs, rmicro in ((512, 4), (128, 1), (64, 1)):
            try:
                rips, rp50, rloss, rmfu = measure(rbs, remat=False,
                                                  microbatches=rmicro,
                                                  config="imagenet-reg-224")
                out["reg_train_images_per_sec_per_chip"] = round(rips, 2)
                out["reg_p50_step_time_s"] = round(rp50, 4)
                out["reg_batch_size"] = rbs
                if rmfu is not None:
                    out["reg_mfu"] = round(rmfu, 4)
                break
            except Exception as e:
                print(f"reg bench bs={rbs} failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
        for rbs in (128, 64):
            try:
                rips, rp50 = measure_reconstruct(rbs)
                out["reconstruct_images_per_sec_per_chip"] = round(rips, 2)
                out["reconstruct_p50_step_time_s"] = round(rp50, 4)
                out["reconstruct_batch_size"] = rbs
                break
            except Exception as e:
                print(f"reconstruct bench bs={rbs} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
    # Third workload (round 5): imagenet-cls-256 (the reference's
    # EncoderDecoder_8 256px defaults) at its best measured config —
    # 4x128-accum — so the crop-lowering fix's +23% (NOTES.md "Round-5
    # imagenet-cls-256") is tracked in the driver-recorded JSON.
    # BENCH_SKIP_256=1 skips it.
    if os.environ.get("BENCH_SKIP_256") != "1":
        for cbs, cmicro in ((512, 4), (128, 1)):
            try:
                cips, cp50, closs, cmfu = measure(cbs, remat=False,
                                                  microbatches=cmicro,
                                                  config="imagenet-cls-256")
                out["cls256_train_images_per_sec_per_chip"] = round(cips, 2)
                out["cls256_p50_step_time_s"] = round(cp50, 4)
                out["cls256_batch_size"] = cbs
                if cmfu is not None:
                    out["cls256_mfu"] = round(cmfu, 4)
                break
            except Exception as e:
                print(f"cls256 bench bs={cbs} failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
    # Toolchain canaries (~1 min): re-measure the two deliberately-unadopted
    # layouts vs committed baselines so a jax/libtpu upgrade that flips a
    # parked-optimization verdict shows up in the driver-recorded
    # BENCH_r*.json, not only in a manual probe run. BENCH_SKIP_CANARY=1
    # skips (e.g. CPU-only environments where the timings are meaningless).
    if (os.environ.get("BENCH_SKIP_CANARY") != "1"
            and jax.default_backend() != "cpu"):
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            from canary_probes import run_canaries

            _, flips = run_canaries()
            out["canaries"] = ("ok" if not flips else
                               "FLIPPED:" + ",".join(n for n, _ in flips))
            for name, todo in flips:
                print(f"CANARY OPPORTUNITY [{name}]: {todo}",
                      file=sys.stderr, flush=True)
        except Exception as e:
            out["canaries"] = f"error: {type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
