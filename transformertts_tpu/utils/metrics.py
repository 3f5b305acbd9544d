"""Attention-map quality metrics.

Capability parity with the reference (utils/metrics.py:4-70): per-head
jumpiness (monotonicity of the argmax path), peakiness (mean max attention)
and diagonality (attention mass weighted by normalized distance from the
diagonal). These drive both TensorBoard diagnostics and head selection during
duration extraction, and the diagonal mask doubles as the Aligner's
diagonal-forcing training penalty.

TPU-first change: the reference builds the per-sample diagonal mask in a
host-side Python loop over the batch (utils/metrics.py:47-57); here the mask
is a single broadcasted jnp expression, so the whole metric set jits into the
train step with no host sync.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def attention_jumps_score(att: jax.Array, mel_len: jax.Array, r: int = 1) -> jax.Array:
    """Fraction of consecutive argmax steps whose |move| is ≤ r.

    Deliberate quirk parity with the reference (utils/metrics.py:27-33):
    the diff is abs()'d, so the ``>= 0`` term is vacuous and a backward
    move of ≤ r scores the same as a forward one. This score drives head
    selection in duration extraction, so the formula must match the
    reference exactly to reproduce its duration artifacts.

    att: (B, H, M, N); mel_len: (B,). Returns (B, H).
    """
    max_loc = jnp.argmax(att, axis=3)                            # (B, H, M)
    diff = jnp.abs(max_loc[:, :, 1:] - max_loc[:, :, :-1])       # (B, H, M-1)
    ok = ((diff >= 0) & (diff <= r)).astype(jnp.float32)
    m = jnp.arange(1, att.shape[2])[None, None, :] < mel_len[:, None, None]
    ok = ok * m.astype(jnp.float32)
    return jnp.sum(ok, axis=-1) / jnp.maximum(
        (mel_len - 1).astype(jnp.float32), 1.0)[:, None]


def attention_peak_score(att: jax.Array, mel_len: jax.Array) -> jax.Array:
    """Mean (over frames) of the per-frame max attention. Returns (B, H)."""
    peak = jnp.max(att, axis=3)                                  # (B, H, M)
    m = (jnp.arange(att.shape[2])[None, None, :]
         < mel_len[:, None, None]).astype(jnp.float32)
    return jnp.mean(peak * m, axis=-1)


def batch_diagonal_mask(att_shape: Tuple[int, ...], mel_len: jax.Array,
                        phon_len: jax.Array) -> jax.Array:
    """Normalized-distance-from-diagonal mask, (B, 1, M, N).

    mask[b, 0, m, n] = |n / phon_len[b] - m / mel_len[b]| inside the valid
    (mel_len[b], phon_len[b]) rectangle, 0 outside. Fully vectorized.

    Lengths are clamped to >= 1: a zero-length (all-padding) sample in a
    ragged bucket batch must yield an all-zero mask, not inf/phon_c * 0 = NaN
    — with diagonal forcing on, one NaN here would poison every gradient.
    """
    _, _, M, N = att_shape
    mel_c = jnp.clip(mel_len, 1, M).astype(jnp.float32)          # (B,)
    phon_c = jnp.clip(phon_len, 1, N).astype(jnp.float32)
    m_idx = jnp.arange(M, dtype=jnp.float32)[None, :, None]      # (1, M, 1)
    n_idx = jnp.arange(N, dtype=jnp.float32)[None, None, :]      # (1, 1, N)
    i = n_idx / phon_c[:, None, None]
    j = m_idx / mel_c[:, None, None]
    valid = ((m_idx < mel_c[:, None, None]) &
             (n_idx < phon_c[:, None, None])).astype(jnp.float32)
    return (jnp.abs(i - j) * valid)[:, None, :, :]


def diagonality_score(att: jax.Array, mel_len: jax.Array, phon_len: jax.Array,
                      diag_mask: jax.Array = None) -> jax.Array:
    """Sum of attention mass weighted by distance from diagonal. (B, H)."""
    if diag_mask is None:
        diag_mask = batch_diagonal_mask(att.shape, mel_len, phon_len)
    return jnp.sum(att * diag_mask, axis=(-2, -1))


def attention_score(att: jax.Array, mel_len: jax.Array, phon_len: jax.Array,
                    r: int = 1) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(jumpiness, peakiness, 3/diagonality) per (sample, head).

    Same triple as the reference (utils/metrics.py:4-24); higher is better
    for each component.
    """
    loc = attention_jumps_score(att, mel_len, r)
    peak = attention_peak_score(att, mel_len)
    diag = diagonality_score(att, mel_len, phon_len)
    # all-padding samples have zero attention mass in the valid rectangle;
    # keep their score finite so batch reductions stay finite
    return loc, peak, 3.0 / jnp.maximum(diag, 1e-8)
