"""Multi-head attention with the reference's nonstandard output projection.

The reference MHA (model/layers.py:105-151) projects
``concat([q_in, attention_output], -1)`` — a (2·model_dim → model_dim) output
dense — instead of the usual attention-only projection. This is
checkpoint-shape critical, so it is preserved here.

The jnp softmax path also returns attention weights (needed by the Aligner
teacher, diagonal-forcing losses and TensorBoard diagnostics).

Training-path layout: the step is HBM-bound (BASELINE.md roofline), so the
dropout-active attention under *bfloat16 compute* is wrapped in
``jax.checkpoint`` — backward recomputes QK^T, the f32 softmax and the
dropout mask (same rng -> identical mask) instead of storing the
(B,H,Tq,Tk) weights and their dropped product between forward and backward.
Measured on the real chip (scripts/bench_remat_train_step.py +
scripts/ab_remat_landed.py, BASELINE.md remat/flash A/B): -2.0 ms/step at
the bf16 TTS B16x896f bucket; the float32 Aligner REGRESSES by +11.4 ms
under remat (f32 matmuls run at Precision.HIGHEST, so the recompute is
multi-pass-expensive) — hence the dtype gate. The Pallas flash-attention
kernel (ops/flash_attention.py) measured SLOWER than this jnp path at every
bucket once compared against its fair dropout-free control, so it remains
tested reference code, not the production path.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from transformertts_tpu.nn import core

NEG_INF = -1e9

# Store-narrow / return-exact boundary for FLOAT32 attention (the aligner's
# dtype): when True, the (B,H,Tq,Tk) softmax numerator is rounded to bf16 at
# the fusion boundary for the PV matmul (single-pass MXU instead of
# Precision.HIGHEST multi-pass f32) while the RETURNED normalized weights —
# what the aligner teacher losses and duration extraction consume — stay
# exact f32, bit-identical to the plain path. This changes only the
# attention OUTPUT's numerics (~bf16 resolution), not the attention maps.
# The module default stays False (f32 TTS forward keeps <1e-4 reference
# parity); AlignerTrainer turns it on per-trace (narrow_pv=True default) via
# its _attention_scope. scripts/measure_aligner_narrow_pv.py measures the
# step-time and extraction-fidelity sides of the trade (real v5e:
# -4.5/-13.0/-12.7% ms/step, 100% same-weights duration agreement).
F32_NARROW_PV = False


def scaled_dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                 mask: Optional[jax.Array],
                                 dropout_rate: float = 0.0,
                                 rng: Optional[jax.Array] = None,
                                 deterministic: bool = True
                                 ) -> Tuple[jax.Array, jax.Array]:
    """q,k,v: (B, H, T, D). mask broadcastable to (B, H, Tq, Tk), 1 = masked.

    Returns (output (B,H,Tq,D), weights (B,H,Tq,Tk)). Softmax in float32.
    The dropout-active (training) path is rematerialized — see module
    docstring; numerics are identical to the plain path (same rng stream).
    """
    # Remat only pays when recompute is cheap relative to the saved traffic:
    # bf16 matmuls are single-pass MXU ops, but float32 runs at
    # Precision.HIGHEST (multi-pass emulation — see core.matmul_precision),
    # where recomputing QK^T costs more than the stored weights. Measured
    # (scripts/ab_remat_landed.py): bf16 TTS −2.0 ms/step at B16x896f;
    # f32 Aligner +11.4 ms/step if remat is forced on.
    if (deterministic or dropout_rate == 0.0 or rng is None
            or q.dtype != jnp.bfloat16):
        return _sdpa(q, k, v, mask, dropout_rate, rng, deterministic)
    if mask is None:
        mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
    fn = jax.checkpoint(
        lambda q_, k_, v_, m_, r_: _sdpa(q_, k_, v_, m_, dropout_rate, r_,
                                         False),
        policy=jax.checkpoint_policies.nothing_saveable)
    return fn(q, k, v, mask, rng)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
          mask: Optional[jax.Array], dropout_rate: float,
          rng: Optional[jax.Array], deterministic: bool
          ) -> Tuple[jax.Array, jax.Array]:
    dk = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        precision=core.matmul_precision(q.dtype))
    # softmax in float32 regardless of compute dtype
    logits = logits.astype(jnp.float32) / jnp.sqrt(jnp.float32(dk))
    if mask is not None:
        logits = logits + mask.astype(jnp.float32) * NEG_INF
    if v.dtype == jnp.bfloat16:
        # Store the attention weights bf16 at the fusion boundary: the
        # (B,H,Tq,Tk) softmax output is the synthesis path's largest HBM
        # tensor (302 MB f32 at B64xT768) and the PV matmul re-reads it
        # memory-bound (profiled 72 TF/s, scripts/profile_synthesis.py).
        # A plain ``softmax().astype(bf16)`` does NOT narrow the boundary —
        # XLA sinks the convert into the consumer fusion and ships f32 —
        # and pinning bf16(softmax) with a barrier forces XLA to
        # materialize the f32 exp before the row-normalizing divide
        # (measured +2.5 ms vs no change). Instead, softmax's linearity in
        # the matmul is used: (w/denom)@V == (w@V)/denom. The producer
        # fusion writes ONE bf16 rounding of the unnormalized exp (pinned
        # by the barrier) plus the tiny exact-f32 denominator; the divide
        # moves off the (Tq,Tk) tensor onto the (Tq,D) output, applied to
        # the f32 MXU accumulation and cast once. Dropout commutes (it is
        # an elementwise mask-and-scale), so the training path applies it
        # to the numerator — same rng, same mask, mathematically identical.
        # Full-precision normalized weights are still returned for
        # diagnostics/teacher use (DCE'd when unused, e.g. all of
        # synthesis). Measured (real v5e, bench.py B64x128t->768f):
        # 26.3 -> 23.8 ms/dispatch, 1.877M -> 2.065M frames/s (+10%);
        # bf16-vs-f32 mel MAE 0.0128 -> 0.0159 (2.7% -> 3.3% of mel std —
        # partly duration-jitter chaos, see BASELINE.md synthesis roofline).
        # Rejected variants (measured): barrier(bf16(softmax)) 28.8 ms;
        # exp(logits-lse) with barrier 25.4 ms AND worse MAE 0.0183.
        m = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - m)
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        weights = unnorm / denom
        unnorm_b, denom_b = jax.lax.optimization_barrier(
            (unnorm.astype(v.dtype), denom))
        numer_used = core.dropout(unnorm_b, dropout_rate, rng, deterministic)
        out_unnorm = jnp.einsum('bhqk,bhkd->bhqd', numer_used, v,
                                precision=core.matmul_precision(v.dtype),
                                preferred_element_type=jnp.float32)
        out = (out_unnorm / denom_b).astype(v.dtype)
        return out, weights
    if F32_NARROW_PV and v.dtype == jnp.float32:
        # f32 variant of the bf16 numerator boundary above: same linearity
        # trick, but the exact-f32 normalized weights are both returned AND
        # (unlike the bf16 path) always live — the aligner consumes them.
        # The win here is the PV matmul itself: bf16 operands run one MXU
        # pass instead of Precision.HIGHEST's multi-pass f32 emulation, and
        # the (Tq,Tk) operand it streams is half-width.
        m = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - m)
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        weights = unnorm / denom
        unnorm_b, denom_b = jax.lax.optimization_barrier(
            (unnorm.astype(jnp.bfloat16), denom))
        numer_used = core.dropout(unnorm_b, dropout_rate, rng, deterministic)
        out_unnorm = jnp.einsum('bhqk,bhkd->bhqd', numer_used,
                                v.astype(jnp.bfloat16),
                                precision=core.matmul_precision(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        out = out_unnorm / denom_b
        return out, weights
    weights = jax.nn.softmax(logits, axis=-1)
    weights_used = core.dropout(weights, dropout_rate, rng, deterministic)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights_used, v,
                     precision=core.matmul_precision(v.dtype))
    return out, weights


class MultiHeadAttention:

    def __init__(self, model_dim: int, num_heads: int, dropout_rate: float):
        assert model_dim % num_heads == 0
        self.model_dim = model_dim
        self.num_heads = num_heads
        self.depth = model_dim // num_heads
        self.dropout_rate = dropout_rate
        self.wq = core.Dense(model_dim, model_dim)
        self.wk = core.Dense(model_dim, model_dim)
        self.wv = core.Dense(model_dim, model_dim)
        # output projection consumes concat([q_in, attn], -1)
        self.wo = core.Dense(2 * model_dim, model_dim)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {
            'wq': self.wq, 'wk': self.wk, 'wv': self.wv, 'wo': self.wo})

    def _split_heads(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.depth).transpose(0, 2, 1, 3)

    def _merge_heads(self, x: jax.Array) -> jax.Array:
        b, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)

    def apply(self, params: core.Params, v_in: jax.Array, k_in: jax.Array,
              q_in: jax.Array, mask: Optional[jax.Array],
              rng: Optional[jax.Array] = None, deterministic: bool = True
              ) -> Tuple[jax.Array, jax.Array]:
        q = self._split_heads(self.wq.apply(params['wq'], q_in))
        k = self._split_heads(self.wk.apply(params['wk'], k_in))
        v = self._split_heads(self.wv.apply(params['wv'], v_in))
        attn_rng, out_rng = (jax.random.split(rng) if rng is not None
                             else (None, None))
        attn, weights = scaled_dot_product_attention(
            q, k, v, mask, self.dropout_rate, attn_rng, deterministic)
        attn = self._merge_heads(attn)
        out = self.wo.apply(params['wo'], jnp.concatenate([q_in, attn], axis=-1))
        out = core.dropout(out, self.dropout_rate, out_rng, deterministic)
        return out, weights

    def project_kv(self, params: core.Params, kv_in: jax.Array):
        """Precompute split-head K/V projections of a fixed memory (e.g. the
        encoder output) for repeated cross-attention during AR decode."""
        k = self._split_heads(self.wk.apply(params['wk'], kv_in))
        v = self._split_heads(self.wv.apply(params['wv'], kv_in))
        return k, v

    def apply_kv(self, params: core.Params, q_in: jax.Array, k: jax.Array,
                 v: jax.Array, mask: Optional[jax.Array]
                 ) -> Tuple[jax.Array, jax.Array]:
        """Attention with already-projected K/V (decode path, no dropout)."""
        q = self._split_heads(self.wq.apply(params['wq'], q_in))
        attn, weights = scaled_dot_product_attention(q, k, v, mask)
        attn = self._merge_heads(attn)
        out = self.wo.apply(params['wo'], jnp.concatenate([q_in, attn], axis=-1))
        return out, weights

    def apply_cached(self, params: core.Params, q_in: jax.Array,
                     k_cache: jax.Array, v_cache: jax.Array,
                     new_kv_in: jax.Array, cache_index: jax.Array,
                     mask: Optional[jax.Array]
                     ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Incremental self-attention for autoregressive decode.

        ``k_cache``/``v_cache`` are (B, H, T_max, D) rings written at
        ``cache_index``. ``new_kv_in`` is the (B, 1, model_dim) new position
        input; ``q_in`` the same position's query input. The causal property
        is enforced by masking positions > cache_index via ``mask``.
        Deterministic (no dropout) — decode path only.
        """
        q = self._split_heads(self.wq.apply(params['wq'], q_in))
        k_new = self._split_heads(self.wk.apply(params['wk'], new_kv_in))
        v_new = self._split_heads(self.wv.apply(params['wv'], new_kv_in))
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, 0, cache_index, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, 0, cache_index, 0))
        attn, weights = scaled_dot_product_attention(q, k_cache, v_cache, mask)
        attn = self._merge_heads(attn)
        out = self.wo.apply(params['wo'], jnp.concatenate([q_in, attn], axis=-1))
        return out, weights, k_cache, v_cache
