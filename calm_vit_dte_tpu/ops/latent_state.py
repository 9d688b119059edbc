"""Cross-layer latent residual accumulator, as an explicit trace-time carry.

The reference's ResidualStateManager (reference: Vi_Tools_CNN_less_V2.py:7-50)
is a mutable Python object threaded through all variational cross layers of a
forward pass, accumulating (zq, zkv) running combinations plus a KL sum. In
JAX the forward is traced once, so the carry can stay a plain Python object
holding traced arrays: the layer count and combine mode are static, only the
accumulated tensors are traced values. No pytree registration is needed
because a LatentState never crosses a jit boundary — it lives and dies inside
one model apply.

Combine modes (reference: :31-47):
  "sum"  running sum (used by EncoderDecoder8's shared cross-state),
  "sma"  simple moving average (sum / count returned),
  "ema"  momentum = smooth_factor / (count + 1), early layers weighted more,
  "lp"   momentum = count / (count + 1), later layers weighted more,
  other  static momentum.

All cross layers feeding one manager share shapes by construction: the
reduce path always lands in (B, seq_len_reduce, mean_var_hidden) space.
The encoder/decoder managers created under force_reduce do NOT — their
latents keep each block's own sequence length, and the reference crashes on
the shape-mismatched add (verified: RuntimeError "size of tensor a (48) must
match b (36)"). Fixed here, preserving intent: the running combination
restarts whenever the latent shape changes, while the KL sum (a scalar, the
training-relevant output) keeps accumulating across every layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LatentState:
    def __init__(self, mode: str = "ema", smooth_factor: float = 2.0,
                 momentum: float = 0.9):
        self.mode = mode
        self.smooth_factor = smooth_factor
        self.momentum = momentum
        self.zq_sum: jax.Array | None = None
        self.zkv_sum: jax.Array | None = None
        self.kl_sum: jax.Array | float = 0.0
        self.count: int = 0      # combine count (resets on shape change)
        self.kl_count: int = 0   # total updates (KL divisor)

    def update(self, zq, zkv, mean_q, var_q, mean_kv, var_kv):
        """Accumulate one layer's latents; returns the combined (zq, zkv)."""
        from calm_vit_dte_tpu.ops.variational import kl_divergence

        self.kl_sum = (kl_divergence(mean_q, var_q)
                       + kl_divergence(mean_kv, var_kv) + self.kl_sum)
        self.kl_count += 1
        if self.zq_sum is None or self.zq_sum.shape != zq.shape:
            self.zq_sum = zq
            self.zkv_sum = zkv
            self.count = 1
        elif self.mode not in ("sum", "sma"):
            self.count += 1
            m = self.momentum
            if self.mode == "ema":
                m = self.smooth_factor / (self.count + 1)
            elif self.mode == "lp":
                m = self.count / (self.count + 1)
            self.zq_sum = m * zq + (1.0 - m) * self.zq_sum
            self.zkv_sum = m * zkv + (1.0 - m) * self.zkv_sum
        else:
            self.count += 1
            self.zq_sum = self.zq_sum + zq
            self.zkv_sum = self.zkv_sum + zkv
            if self.mode == "sma":
                return self.zq_sum / self.count, self.zkv_sum / self.count
        return self.zq_sum, self.zkv_sum

    def kl_loss(self) -> jax.Array:
        if self.kl_count == 0:
            return jnp.zeros((), jnp.float32)
        return jnp.asarray(self.kl_sum, jnp.float32) / self.kl_count
