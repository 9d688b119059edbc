"""VMLA ("Variational Multi-Head Latent Attention") block.

The core primitive of CALM-ViT (reference: Vi_Tools_CNN_less_V2.py:98-315):
a pre-LN attention block with
  1. optional *feature* bottleneck: x -> (mu, sigma) via spectral-normed
     linear, sigma = softplus + 1e-6, reparameterized sample during training;
  2. optional *temporal* bottleneck: linear over the sequence axis
     seq_length -> seq_len_reduce, then per-stream upsample -> seq_len_new;
  3. DeepSeek-MLA-style decoupled RoPE (separate qr/kr projections, RoPE on
     the rope half only, concat with the content half) when reducing; plain
     RoPE over the full head dim otherwise;
  4. learned additive attention mask: a 2-layer GELU MLP over the key axis of
     the head-summed score matrix ("latent masking");
  5. LayerScale on the attention and MLP branches;
  6. residual shape-adaptation projections when seq/dim change;
  7. a 2x GELU MLP;
  8. spectral norm on every linear.

This is a functional re-design: parameters and spectral-norm power-iteration
vectors are explicit pytrees; variational noise comes from an explicit PRNG
key; the cross-layer latent accumulator is a trace-time carry (LatentState).
Control flow (reduce / t_reduce) is static, so jit sees fixed shapes.

Known reference defect fixed here: with mask=False the reference crashes on
mask_mat.unsqueeze (reference: :290-291); use_mask=False works here.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn.linear import sn_linear_init, sn_linear_apply
from calm_vit_dte_tpu.nn.norm import layer_norm_init, layer_norm_apply
from calm_vit_dte_tpu.ops.attention import masked_rope_attention
from calm_vit_dte_tpu.ops.latent_state import LatentState
from calm_vit_dte_tpu.ops.rope import rope_init
from calm_vit_dte_tpu.ops.variational import softplus_var, reparameterize


@dataclass(frozen=True)
class VMLAConfig:
    heads: int
    dim1: int
    dim2: int
    mean_var_hidden: int
    seq_length: int
    seq_len_reduce: int
    seq_len_new: int
    mlp_dim: int
    force_reduce: bool = False
    t_force_reduce: bool = False
    dropout: float = 0.0
    use_mlp: bool = True
    is_cross: bool = False

    @property
    def reduce(self) -> bool:
        return self.dim1 != self.dim2 or self.force_reduce

    @property
    def t_reduce(self) -> bool:
        return self.seq_len_new != self.seq_length or self.t_force_reduce

    @property
    def head_dim_content(self) -> int:
        return self.dim2 // self.heads // 2

    @property
    def head_dim_rope(self) -> int:
        return self.dim2 // self.heads // 2

    @property
    def head_dim(self) -> int:
        return self.head_dim_content + self.head_dim_rope

    def validate(self):
        rope_dim = self.head_dim_rope if self.reduce else self.head_dim
        if rope_dim % 2 != 0:
            raise ValueError(
                f"VMLA stage dim2={self.dim2}, heads={self.heads} yields odd "
                f"RoPE dim {rope_dim}; dim2 % (4*heads) == 0 is required.")


def vmla_init(cfg: VMLAConfig, key: jax.Array) -> tuple[dict, dict]:
    cfg.validate()
    keys = iter(jax.random.split(key, 32))
    params: dict = {}
    state: dict = {}

    def add_sn(name: str, in_dim: int, out_dim: int, bias: bool = False):
        p, s = sn_linear_init(next(keys), in_dim, out_dim, bias=bias)
        params[name] = p
        state[name] = s

    params["ls_att"] = jnp.ones((cfg.dim2,), jnp.float32)
    if cfg.use_mlp:
        params["ls_mlp"] = jnp.ones((cfg.dim2,), jnp.float32)
    params["ln_q"] = layer_norm_init(cfg.dim1)
    if cfg.is_cross:
        params["ln_kv"] = layer_norm_init(cfg.dim1)
    if cfg.t_reduce:
        add_sn("t_encoder_q", cfg.seq_length, cfg.seq_len_reduce)
        add_sn("t_encoder_kv", cfg.seq_length, cfg.seq_len_reduce)
    if cfg.reduce:
        add_sn("encoder_q", cfg.dim1, cfg.mean_var_hidden * 2)
        add_sn("encoder_kv", cfg.dim1, cfg.mean_var_hidden * 2)
    if cfg.t_reduce:
        add_sn("t_qz_upsample", cfg.seq_len_reduce, cfg.seq_len_new)
        add_sn("t_kz_upsample", cfg.seq_len_reduce, cfg.seq_len_new)
        add_sn("t_vz_upsample", cfg.seq_len_reduce, cfg.seq_len_new)
        add_sn("t_qr_proj", cfg.seq_len_reduce, cfg.seq_len_new)
        add_sn("t_kr_proj", cfg.seq_length, cfg.seq_len_new)
    qkv_in = cfg.mean_var_hidden if cfg.reduce else cfg.dim2
    qk_out = cfg.heads * (cfg.head_dim_content if cfg.reduce else cfg.head_dim)
    add_sn("q_proj", qkv_in, qk_out)
    add_sn("k_proj", qkv_in, qk_out)
    add_sn("v_proj", qkv_in, cfg.dim2)
    if cfg.reduce:
        add_sn("qr_proj", cfg.mean_var_hidden, cfg.head_dim_rope * cfg.heads)
        add_sn("kr_proj", cfg.dim1, cfg.head_dim_rope * cfg.heads)
    if cfg.seq_len_new != cfg.seq_length:
        add_sn("input_t_proj", cfg.seq_length, cfg.seq_len_new)
    if cfg.dim1 != cfg.dim2:
        add_sn("input_proj", cfg.dim1, cfg.dim2)
    rope_dim = cfg.head_dim_rope if cfg.reduce else cfg.head_dim
    params["rope_q"] = rope_init(rope_dim)
    params["rope_k"] = rope_init(rope_dim)
    # Learned attention mask MLP.
    p1, s1 = sn_linear_init(next(keys), cfg.seq_len_new,
                            cfg.seq_len_new * 2, bias=True)
    p2, s2 = sn_linear_init(next(keys), cfg.seq_len_new * 2,
                            cfg.seq_len_new, bias=True)
    params["linear_mask"] = {"fc1": p1, "fc2": p2}
    state["linear_mask"] = {"fc1": s1, "fc2": s2}
    add_sn("out_proj", cfg.dim2, cfg.dim2)
    params["ln_2"] = layer_norm_init(cfg.dim2)
    if cfg.use_mlp:
        add_sn("mlp_fc1", cfg.dim2, cfg.mlp_dim)
        add_sn("mlp_fc2", cfg.mlp_dim, cfg.dim2)
    return params, state


def _sn_seq(p: dict, s: dict, x: jax.Array, *, training: bool, dtype):
    """Spectral-normed linear over the sequence (-2) axis.

    Contracts the seq axis directly with dot_general instead of a swapaxes
    round-trip — the transposes materialized as real HBM copies (~44 ms/step
    at batch 128, measured)."""
    from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

    if "w_q" in p:  # int8-quantized serving path (quantize.py)
        from calm_vit_dte_tpu.quantize import qdot_seq, qdot_seq_wo

        if "w_so" in p:  # w8a16 weight-only
            return qdot_seq_wo(x, p["w_q"], p["w_so"], dtype=dtype), s
        return qdot_seq(x, p["w_q"], p["w_s"], dtype=dtype), s
    w_norm, st = spectral_normalize(p["w"], s, training=training)
    y = jnp.einsum("ns,bsd->bnd", w_norm.astype(dtype), x.astype(dtype),
                   preferred_element_type=dtype)
    return y, st


def _sn_multi(params: dict, state: dict, names: list[str], x: jax.Array,
              new_state: dict, *, training: bool, dtype,
              seq_axis: bool = False) -> list[jax.Array]:
    """Spectral-normed projections sharing one input, merged into a single
    matmul: per-weight sigma is computed separately (semantics unchanged,
    column-wise bit-identical), the normalized weights concatenate along the
    output axis. Halves-to-thirds the matmul launch count per VMLA layer.
    seq_axis=True contracts the sequence (-2) axis instead of features."""
    from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

    if all("w_q" in params[n] for n in names):
        # int8-quantized serving path (quantize.py): the merged matmul runs
        # int8 on the MXU (w8a8) or bf16 with int8 weight reads (w8a16);
        # per-row scales concatenate like the weights.
        from calm_vit_dte_tpu.quantize import (qdot, qdot_seq, qdot_seq_wo,
                                               qdot_wo)

        wo = "w_so" in params[names[0]]
        if any(("w_so" in params[n]) != wo for n in names):
            raise ValueError(
                "merged projections must share one quantization scheme: "
                + ", ".join(f"{n}={'w8a16' if 'w_so' in params[n] else 'w8a8'}"
                            for n in names))
        skey = "w_so" if wo else "w_s"
        wq = jnp.concatenate([params[n]["w_q"] for n in names], axis=0)
        sc = jnp.concatenate([params[n][skey] for n in names], axis=0)
        sizes = [params[n]["w_q"].shape[0] for n in names]
        for n in names:
            new_state[n] = state[n]
        if seq_axis:
            y = (qdot_seq_wo if wo else qdot_seq)(x, wq, sc, dtype=dtype)
            axis = -2
        else:
            y = (qdot_wo if wo else qdot)(x, wq, sc, dtype=dtype)
            axis = -1
        bounds = []
        acc = 0
        for sz in sizes[:-1]:
            acc += sz
            bounds.append(acc)
        return jnp.split(y, bounds, axis=axis)

    ws = []
    sizes = []
    for n in names:
        w, st = spectral_normalize(params[n]["w"], state[n],
                                   training=training)
        ws.append(w.astype(dtype))
        sizes.append(w.shape[0])
        new_state[n] = st
    w_cat = jnp.concatenate(ws, axis=0)
    if seq_axis:
        y = jnp.einsum("ns,bsd->bnd", w_cat, x.astype(dtype),
                       preferred_element_type=dtype)
        axis = -2
    else:
        y = jnp.dot(x.astype(dtype), w_cat.T, preferred_element_type=dtype)
        axis = -1
    bounds = []
    acc = 0
    for sz in sizes[:-1]:
        acc += sz
        bounds.append(acc)
    return jnp.split(y, bounds, axis=axis)


def _split_heads(x: jax.Array, heads: int, head_dim: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)


def _sn_heads(p: dict, s: dict, x: jax.Array, heads: int, dhead: int, *,
              training: bool, dtype) -> tuple[jax.Array, dict]:
    """Spectral-normed projection emitting the head-split (b,h,s,d) layout
    DIRECTLY as one einsum contraction — no materialized (b,s,h*d) tensor,
    no reshape+transpose pair. Standalone A/B at the S=224 flagship shape:
    4.26 vs 4.91 ms fwd+bwd for the merged-dot+split+transpose chain
    (scripts/layout_probe.py). Enabled via CALM_PROJ_IMPL=einsum pending
    the in-model A/B (standalone wins historically shrink in-step)."""
    from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

    w_norm, st = spectral_normalize(p["w"], s, training=training)
    wh = w_norm.astype(dtype).reshape(heads, dhead, w_norm.shape[-1])
    y = jnp.einsum("bsk,hdk->bhsd", x.astype(dtype), wh,
                   preferred_element_type=dtype)
    return y, st


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def vmla_apply(cfg: VMLAConfig, params: dict, state: dict,
               input_q: jax.Array, input_kv: jax.Array | None = None,
               latent: LatentState | None = None, *, training: bool,
               rng: jax.Array | None = None, dtype=jnp.float32,
               use_mask: bool = True,
               ) -> tuple[jax.Array, dict, LatentState | None]:
    """Forward one VMLA layer. Returns (y, new_state, latent carry)."""
    new_state = dict(state)
    residual = input_q

    xq = layer_norm_apply(params["ln_q"], input_q, dtype=dtype)
    if input_kv is None:
        xkv = xq
    else:
        xkv = layer_norm_apply(params["ln_kv"], input_kv, dtype=dtype)

    qz, kz, vz, qr, kr = xq, xkv, xkv, xq, xkv
    if cfg.reduce:
        if cfg.t_reduce:
            xq, new_state["t_encoder_q"] = _sn_seq(
                params["t_encoder_q"], state["t_encoder_q"], xq,
                training=training, dtype=dtype)
            xkv, new_state["t_encoder_kv"] = _sn_seq(
                params["t_encoder_kv"], state["t_encoder_kv"], xkv,
                training=training, dtype=dtype)
        mv_q, new_state["encoder_q"] = sn_linear_apply(
            params["encoder_q"], state["encoder_q"], xq,
            training=training, dtype=dtype)
        mv_kv, new_state["encoder_kv"] = sn_linear_apply(
            params["encoder_kv"], state["encoder_kv"], xkv,
            training=training, dtype=dtype)
        mean_zq, var_zq_raw = jnp.split(mv_q, 2, axis=-1)
        mean_zkv, var_zkv_raw = jnp.split(mv_kv, 2, axis=-1)
        var_zq = softplus_var(var_zq_raw)
        var_zkv = softplus_var(var_zkv_raw)
        if training:
            kq, kkv = jax.random.split(rng)
        else:
            kq = kkv = None
        zq = reparameterize(kq, mean_zq, var_zq, training=training)
        zkv = reparameterize(kkv, mean_zkv, var_zkv, training=training)
        if latent is not None:
            zq, zkv = latent.update(zq, zkv, mean_zq, var_zq,
                                    mean_zkv, var_zkv)
        zq = zq.astype(dtype)
        zkv = zkv.astype(dtype)
        qr, qz, kz, vz = zq, zq, zkv, zkv
        if cfg.t_reduce:
            # Upsamples sharing an input merge into one seq-axis matmul.
            qz, qr = _sn_multi(params, state,
                               ["t_qz_upsample", "t_qr_proj"], zq,
                               new_state, training=training, dtype=dtype,
                               seq_axis=True)
            kz, vz = _sn_multi(params, state,
                               ["t_kz_upsample", "t_vz_upsample"], zkv,
                               new_state, training=training, dtype=dtype,
                               seq_axis=True)
            # kr upsamples from the full-resolution normed kv (reference
            # binds kr before the temporal encoder rebinding, :221 vs :227).
            kr, new_state["t_kr_proj"] = _sn_seq(
                params["t_kr_proj"], state["t_kr_proj"], kr,
                training=training, dtype=dtype)

    content_dim = cfg.head_dim_content if cfg.reduce else cfg.head_dim
    import os

    # In-model A/B (v5e-1, flagship): einsum projections LOSE 1.2% on the
    # training step (619.7 vs 627.1 img/s — the backward favors XLA's
    # fusion of the merged-dot chain) but WIN 4.8% on the eval/serving
    # forward (2006 vs 1915 img/s). Default: einsum when not training,
    # merged-dot+split when training; CALM_PROJ_IMPL=einsum|split forces.
    impl = os.environ.get("CALM_PROJ_IMPL")
    use_einsum = ("w" in params["q_proj"]
                  and (impl == "einsum"
                       or (impl is None and not training)))
    if use_einsum:
        # Head-split einsum projections (see _sn_heads): each projection
        # contracts straight into (b,h,s,d); no merged dot, no transpose.
        q, new_state["q_proj"] = _sn_heads(
            params["q_proj"], state["q_proj"], qz, cfg.heads, content_dim,
            training=training, dtype=dtype)
        k, new_state["k_proj"] = _sn_heads(
            params["k_proj"], state["k_proj"], kz, cfg.heads, content_dim,
            training=training, dtype=dtype)
        v, new_state["v_proj"] = _sn_heads(
            params["v_proj"], state["v_proj"], vz, cfg.heads, cfg.head_dim,
            training=training, dtype=dtype)
        if cfg.reduce:
            qr, new_state["qr_proj"] = _sn_heads(
                params["qr_proj"], state["qr_proj"], qr, cfg.heads,
                cfg.head_dim_rope, training=training, dtype=dtype)
            kr, new_state["kr_proj"] = _sn_heads(
                params["kr_proj"], state["kr_proj"], kr, cfg.heads,
                cfg.head_dim_rope, training=training, dtype=dtype)
            qc, kc = q, k
        else:
            qr, kr = q, k
            qc = kc = None
    else:
        # q/k/v (+ decoupled-rope) projections, merged per shared input.
        proj = {"q_proj": qz, "k_proj": kz, "v_proj": vz}
        if cfg.reduce:
            proj["qr_proj"] = qr
            proj["kr_proj"] = kr
        groups: list[tuple[list[str], jax.Array]] = []
        for name, inp in proj.items():
            for names, g_inp in groups:
                if g_inp is inp:
                    names.append(name)
                    break
            else:
                groups.append(([name], inp))
        outs: dict[str, jax.Array] = {}
        for names, inp in groups:
            if len(names) == 1:
                outs[names[0]], new_state[names[0]] = sn_linear_apply(
                    params[names[0]], state[names[0]], inp,
                    training=training, dtype=dtype)
            else:
                for name, y in zip(names, _sn_multi(
                        params, state, names, inp, new_state,
                        training=training, dtype=dtype)):
                    outs[name] = y

        q = _split_heads(outs["q_proj"], cfg.heads, content_dim)
        k = _split_heads(outs["k_proj"], cfg.heads, content_dim)
        v = _split_heads(outs["v_proj"], cfg.heads, cfg.head_dim)

        # RoPE rotation and content++rope concat happen inside the
        # attention op (in VMEM on the fused TPU path; reference chain at
        # Vi_Tools_CNN_less_V2.py:274-285 materializes both).
        if cfg.reduce:
            qr = _split_heads(outs["qr_proj"], cfg.heads,
                              cfg.head_dim_rope)
            kr = _split_heads(outs["kr_proj"], cfg.heads,
                              cfg.head_dim_rope)
            qc, kc = q, k
        else:
            qr, kr = q, k
            qc = kc = None
    attn, new_state["linear_mask"] = masked_rope_attention(
        qc, qr, kc, kr, v, params["rope_q"], params["rope_k"],
        params.get("linear_mask"), state.get("linear_mask"),
        training=training, dtype=dtype, use_mask=use_mask)
    x = _merge_heads(attn)
    x, new_state["out_proj"] = sn_linear_apply(
        params["out_proj"], state["out_proj"], x, training=training,
        dtype=dtype)
    x = x * params["ls_att"].astype(dtype)
    if cfg.dropout > 0.0 and training:
        keep = 1.0 - cfg.dropout
        drop_key = jax.random.fold_in(rng, 1)
        x = x * jax.random.bernoulli(drop_key, keep, x.shape) / keep

    if residual.shape != x.shape:
        if "input_t_proj" in params:
            residual, new_state["input_t_proj"] = _sn_seq(
                params["input_t_proj"], state["input_t_proj"], residual,
                training=training, dtype=dtype)
        if "input_proj" in params:
            residual, new_state["input_proj"] = sn_linear_apply(
                params["input_proj"], state["input_proj"], residual,
                training=training, dtype=dtype)
    x = x + residual.astype(dtype)

    if cfg.use_mlp:
        y = layer_norm_apply(params["ln_2"], x, dtype=dtype)
        y, new_state["mlp_fc1"] = sn_linear_apply(
            params["mlp_fc1"], state["mlp_fc1"], y, training=training,
            dtype=dtype)
        y = jax.nn.gelu(y, approximate=False)
        y, new_state["mlp_fc2"] = sn_linear_apply(
            params["mlp_fc2"], state["mlp_fc2"], y, training=training,
            dtype=dtype)
        y = y * params["ls_mlp"].astype(dtype)
        out = x + y
    else:
        out = layer_norm_apply(params["ln_2"], x, dtype=dtype)
    return out, new_state, latent
