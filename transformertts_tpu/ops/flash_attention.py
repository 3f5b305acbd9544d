"""Fused attention kernel (Pallas TPU) — REFERENCE CODE, not wired into the
models.

At this framework's published model scale (2 heads, d=384, T <= ~1000)
attention is a small slice of step time — the device profile shows conv
fusions dominating — and the Aligner path needs the attention weights
materialized anyway (duration extraction, diagonal-forcing losses; they are
a *differentiated loss input* there, so no flash formulation applies). The
measured end-to-end win was ~3-5% on the inference path only, so the model
config knob that enabled this kernel was removed; the kernels stay here,
tested (tests/test_flash_attention.py), as the starting point should a
future config (more heads, longer sequences) make attention hot.

Two entry points: ``flash_attention`` (forward only) and
``flash_attention_trainable`` (custom_vjp with a flash backward — see the
"Trainable variant" section below). Neither implements attention-weight
dropout: training with weight-dropout rate > 0 must either use the jnp path
(exact reference semantics) or wrap it in ``jax.checkpoint`` (same HBM
saving between fwd and bwd, exact dropout semantics — see
scripts/bench_remat_train_step.py).

The reference materializes full (B, H, Tq, Tk) attention-weight tensors in
HBM for every layer (model/layers.py:154-195). This kernel computes
``softmax(qk^T/√d + bias) v`` tile-by-tile in VMEM and never writes the
weights to HBM — removing the O(T²) HBM traffic.

Shape regime: d_head ≤ 256 and T ≤ ~2048, so a whole K/V sequence for one
(batch, head) fits comfortably in VMEM (1280×192×4B ≈ 1 MB). The kernel
therefore tiles only the query axis: grid = (B·H, Tq/TILE_Q); each program
computes one q-tile against the full K/V with an in-register softmax. MXU
does both GEMMs; the exp/normalize runs on the VPU fused between them.

The mask is an additive bias (B·H, Tk) — 0 for valid, -1e9 for padding —
matching the framework's mask convention (nn/masks.py). ``causal=True`` adds
the look-ahead mask via iota comparison inside the kernel (used by the
Aligner's teacher-forced decoder).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, causal,
                 tile_q):
    q = q_ref[0].astype(jnp.float32)           # (TQ, D)
    k = k_ref[0].astype(jnp.float32)           # (T, D)
    v = v_ref[0].astype(jnp.float32)           # (T, D)
    bias = bias_ref[0, 0].astype(jnp.float32)  # (T,)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None, :]
    if causal:
        qi = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + qi * tile_q
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols > rows, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array, causal: bool = False,
                    interpret: bool = None) -> jax.Array:
    """Fused attention: q,k,v (B, H, T, D); bias (B, Tk) additive (0 / -1e9).

    Returns (B, H, Tq, D) in q.dtype. Softmax in float32.
    ``interpret`` defaults to True off-TPU (CPU tests/virtual meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _flash_attention(q, k, v, bias, causal, interpret)


@partial(jax.jit, static_argnames=('causal', 'interpret'))
def _flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     bias: jax.Array, causal: bool = False,
                     interpret: bool = False) -> jax.Array:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / float(np.sqrt(d))
    tile_q = min(128, _round_up(tq, 8))
    tq_pad = _round_up(tq, tile_q)
    tk_pad = _round_up(tk, 128)
    # blocks may span the FULL head dim (Mosaic allows trailing block dims
    # equal to the array dim), so only pad d when it breaks sublane tiling
    d_pad = _round_up(d, 8)

    qf = jnp.zeros((b * h, tq_pad, d_pad), q.dtype)
    qf = qf.at[:, :tq, :d].set(q.reshape(b * h, tq, d))
    kf = jnp.zeros((b * h, tk_pad, d_pad), k.dtype)
    kf = kf.at[:, :tk, :d].set(k.reshape(b * h, tk, d))
    vf = jnp.zeros((b * h, tk_pad, d_pad), v.dtype)
    vf = vf.at[:, :tk, :d].set(v.reshape(b * h, tk, d))
    # padded key positions must be masked out
    biasf = jnp.full((b, tk_pad), NEG_INF, jnp.float32)
    biasf = biasf.at[:, :tk].set(bias.astype(jnp.float32))
    # (B·H, 1, Tk): keeps the block's trailing dims on full array dims,
    # which the Mosaic tiling rules require
    biasf = jnp.repeat(biasf, h, axis=0)[:, None, :]

    grid = (b * h, tq_pad // tile_q)
    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale, causal=causal, tile_q=tile_q),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, tk_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, biasf)
    return out[:, :tq, :d].reshape(b, h, tq, d)


# ---------------------------------------------------------------------------
# Trainable (fwd+bwd) variant — custom_vjp with flash backward
# ---------------------------------------------------------------------------
#
# Standard flash-attention backward (Dao 2022 Alg. 4, re-derived): forward
# additionally saves the per-row logsumexp L = m + log Σexp(s − m) so the
# backward can recompute the probability tile P = exp(s·scale + bias − L)
# exactly, tile by tile, without ever materializing (Tq, Tk) in HBM.  With
# D_i = Σ_d dO_id·O_id (= Σ_j dP_ij·P_ij), the gradients are
#     dS = P ∘ (dP − D),   dQ = dS K·scale,   dK = dSᵀQ·scale,   dV = PᵀdO.
# dQ tiles over queries (each q-tile owns its dQ rows); dK/dV tile over keys
# (each k-tile owns its dK/dV rows) — no cross-tile accumulation anywhere.
# The bias is a padding/attention mask, not a parameter: its cotangent is
# defined (Σ over rows of dS) but deliberately returned as zeros.
# NOTE: no attention-weight dropout inside the kernel — callers that train
# with weight dropout (rate > 0) must use the jnp path or disable it.


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref, *, scale,
                     causal, tile_q):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None, :]
    if causal:
        qi = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) + qi * tile_q
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols > rows, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)
    l_ref[0] = (m[:, 0] + jnp.log(denom[:, 0]))[None, :]


def _attn_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref, d_ref,
                    dq_ref, *, scale, causal, tile_q):
    q = q_ref[0].astype(jnp.float32)            # (TQ, D)
    k = k_ref[0].astype(jnp.float32)            # (T, D)
    v = v_ref[0].astype(jnp.float32)            # (T, D)
    bias = bias_ref[0, 0].astype(jnp.float32)   # (T,)
    do = do_ref[0].astype(jnp.float32)          # (TQ, D)
    lse = l_ref[0, 0].astype(jnp.float32)       # (TQ,)
    dsum = d_ref[0, 0].astype(jnp.float32)      # (TQ,)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias[None, :]
    if causal:
        qi = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * tile_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols > rows, NEG_INF, s)
    p = jnp.exp(s - lse[:, None])               # (TQ, T)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (TQ, T)
    ds = p * (dp - dsum[:, None])
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _attn_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref, d_ref,
                     dk_ref, dv_ref, *, scale, causal, tile_k):
    q = q_ref[0].astype(jnp.float32)            # (T, D) full queries
    k = k_ref[0].astype(jnp.float32)            # (TK, D) this key tile
    v = v_ref[0].astype(jnp.float32)            # (TK, D)
    bias = bias_ref[0, 0].astype(jnp.float32)   # (TK,)
    do = do_ref[0].astype(jnp.float32)          # (T, D)
    lse = l_ref[0, 0].astype(jnp.float32)       # (T,)
    dsum = d_ref[0, 0].astype(jnp.float32)      # (T,)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias[None, :]
    if causal:
        ki = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * tile_k
        s = jnp.where(cols > rows, NEG_INF, s)
    p = jnp.exp(s - lse[:, None])               # (T, TK)
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # (TK, D)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (T, TK)
    ds = p * (dp - dsum[:, None])
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_qkvb(q, k, v, bias):
    """Shared padding to Mosaic-friendly shapes; returns padded arrays +
    original dims. Padded key positions are masked via NEG_INF bias."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    tile_q = min(128, _round_up(tq, 8))
    tq_pad = _round_up(tq, tile_q)
    tk_pad = _round_up(tk, 128)
    d_pad = _round_up(d, 8)
    qf = jnp.zeros((b * h, tq_pad, d_pad), q.dtype)
    qf = qf.at[:, :tq, :d].set(q.reshape(b * h, tq, d))
    kf = jnp.zeros((b * h, tk_pad, d_pad), k.dtype)
    kf = kf.at[:, :tk, :d].set(k.reshape(b * h, tk, d))
    vf = jnp.zeros((b * h, tk_pad, d_pad), v.dtype)
    vf = vf.at[:, :tk, :d].set(v.reshape(b * h, tk, d))
    biasf = jnp.full((b, tk_pad), NEG_INF, jnp.float32)
    biasf = biasf.at[:, :tk].set(bias.astype(jnp.float32))
    biasf = jnp.repeat(biasf, h, axis=0)[:, None, :]
    return qf, kf, vf, biasf, tile_q, tq_pad, tk_pad, d_pad


def _flash_fwd_res(q, k, v, bias, causal, interpret):
    b, h, tq, d = q.shape
    qf, kf, vf, biasf, tile_q, tq_pad, tk_pad, d_pad = _pad_qkvb(q, k, v, bias)
    scale = 1.0 / float(np.sqrt(d))
    grid = (b * h, tq_pad // tile_q)
    out, lse = pl.pallas_call(
        partial(_attn_fwd_kernel, scale=scale, causal=causal, tile_q=tile_q),
        out_shape=[jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, tq_pad), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, tk_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j)),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf)
    return out[:, :tq, :d].reshape(b, h, tq, d), lse


def flash_attention_trainable(q: jax.Array, k: jax.Array, v: jax.Array,
                              bias: jax.Array, causal: bool = False,
                              interpret: bool = None) -> jax.Array:
    """Differentiable fused attention (same contract as flash_attention).

    ``jax.grad`` through this never materializes (B, H, Tq, Tk) in HBM:
    backward recomputes probability tiles from the saved logsumexp. The bias
    cotangent is zeros by design (it is a mask, not a parameter). No
    attention-weight dropout (see module note).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _flash_trainable(q, k, v, bias, causal, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, bias, causal, interpret):
    out, _ = _flash_fwd_res(q, k, v, bias, causal, interpret)
    return out


def _flash_core_fwd(q, k, v, bias, causal, interpret):
    out, lse = _flash_fwd_res(q, k, v, bias, causal, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_core_bwd(causal, interpret, res, dout):
    q, k, v, bias, out, lse = res
    b, h, tq, d = q.shape
    tk = k.shape[2]
    qf, kf, vf, biasf, tile_q, tq_pad, tk_pad, d_pad = _pad_qkvb(q, k, v, bias)
    dof = jnp.zeros((b * h, tq_pad, d_pad), dout.dtype)
    dof = dof.at[:, :tq, :d].set(dout.reshape(b * h, tq, d))
    # lse is already padded (produced at padded shape): (B·H, 1, Tq_pad)
    # D_i = Σ_d dO·O — one cheap fused elementwise+reduce, (B·H, 1, Tq_pad)
    dsum = jnp.zeros((b * h, 1, tq_pad), jnp.float32)
    dsum = dsum.at[:, 0, :tq].set(
        jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                axis=-1).reshape(b * h, tq))
    scale = 1.0 / float(np.sqrt(d))
    tile_k = 128

    dq = pl.pallas_call(
        partial(_attn_dq_kernel, scale=scale, causal=causal, tile_q=tile_q),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        grid=(b * h, tq_pad // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, tk_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, tile_q), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, biasf, dof, lse, dsum)

    dk, dv = pl.pallas_call(
        partial(_attn_dkv_kernel, scale=scale, causal=causal, tile_k=tile_k),
        out_shape=[jax.ShapeDtypeStruct((b * h, tk_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, tk_pad, d_pad), v.dtype)],
        grid=(b * h, tk_pad // tile_k),
        in_specs=[
            pl.BlockSpec((1, tq_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile_k, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_k, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, tile_k), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, tq_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, tq_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, tq_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_k, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_k, d_pad), lambda i, j: (i, j, 0)),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf, dof, lse, dsum)

    dq = dq[:, :tq, :d].reshape(b, h, tq, d)
    dk = dk[:, :tk, :d].reshape(b, h, tk, d)
    dv = dv[:, :tk, :d].reshape(b, h, tk, d)
    return dq, dk, dv, jnp.zeros_like(bias)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@partial(jax.jit, static_argnames=('causal', 'interpret'))
def _flash_trainable(q, k, v, bias, causal, interpret):
    return _flash_core(q, k, v, bias, causal, interpret)


def attention_reference(q, k, v, bias, causal: bool = False) -> jax.Array:
    """jnp reference implementation for kernel tests."""
    d = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(d))
    logits = logits + bias[:, None, None, :].astype(jnp.float32)
    if causal:
        tq, tk = logits.shape[-2:]
        rows = jnp.arange(tq)[:, None]
        cols = jnp.arange(tk)[None, :]
        logits = jnp.where(cols > rows, NEG_INF, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', w, v.astype(jnp.float32)).astype(q.dtype)
