"""Fused attention kernel (Pallas TPU) — REFERENCE CODE, not wired into the
models.

At this framework's published model scale (2 heads, d=384, T <= ~1000)
attention is a small slice of step time — the device profile shows conv
fusions dominating — and the Aligner path needs the attention weights
materialized anyway (duration extraction, diagonal-forcing losses). The
measured end-to-end win was ~3-5% on the inference path only, so the model
config knob that enabled this kernel was removed; the kernel stays here,
tested (tests/test_flash_attention.py), as the starting point should a
future config (more heads, longer sequences) make attention hot.

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
