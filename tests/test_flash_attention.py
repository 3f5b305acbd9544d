"""Pallas fused attention vs jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformertts_tpu.ops.flash_attention import (attention_reference,
                                                    flash_attention)


def _inputs(b=2, h=2, tq=37, tk=53, d=24, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, tk, d)), jnp.float32)
    bias = np.zeros((b, tk), np.float32)
    bias[0, 40:] = -1e9  # padding on sample 0
    return q, k, v, jnp.asarray(bias)


def test_matches_reference_padding_mask():
    q, k, v, bias = _inputs()
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_matches_reference_causal():
    q, k, v, bias = _inputs(tq=41, tk=41, seed=1)
    out = flash_attention(q, k, v, bias, causal=True, interpret=True)
    ref = attention_reference(q, k, v, bias, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bfloat16_path():
    q, k, v, bias = _inputs(seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, bias, interpret=True)
    ref = attention_reference(q, k, v, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_fully_masked_rows_are_finite():
    q, k, v, bias = _inputs(seed=3)
    bias = jnp.full_like(bias, -1e9)   # degenerate: everything masked
    out = flash_attention(q, k, v, bias, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
