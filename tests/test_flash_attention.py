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


# ---------------------------------------------------------------------------
# trainable variant: flash backward vs jax.grad of the jnp reference
# ---------------------------------------------------------------------------

from transformertts_tpu.ops.flash_attention import flash_attention_trainable


def _grad_pair(q, k, v, bias, causal, seed=7):
    """(flash grads, reference grads) for a random-cotangent scalar loss."""
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal(
        (q.shape[0], q.shape[1], q.shape[2], q.shape[3])), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, bias, causal=causal,
                                        interpret=True)
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, bias, causal=causal)
        return jnp.sum(out.astype(jnp.float32) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    return gf, gr


@pytest.mark.parametrize('causal', [False, True])
def test_trainable_forward_matches(causal):
    tq = 41 if causal else 37
    tk = 41 if causal else 53
    q, k, v, bias = _inputs(tq=tq, tk=tk, seed=4)
    out = flash_attention_trainable(q, k, v, bias, causal=causal,
                                    interpret=True)
    ref = attention_reference(q, k, v, bias, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_trainable_grads_match_reference_padding():
    q, k, v, bias = _inputs(seed=5)
    (dq, dk, dv), (rq, rk, rv) = _grad_pair(q, k, v, bias, causal=False)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               atol=5e-5, rtol=1e-3)


def test_trainable_grads_match_reference_causal():
    q, k, v, bias = _inputs(tq=41, tk=41, seed=6)
    (dq, dk, dv), (rq, rk, rv) = _grad_pair(q, k, v, bias, causal=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               atol=5e-5, rtol=1e-3)


def test_trainable_grads_bf16_finite_and_close():
    q, k, v, bias = _inputs(seed=8)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q, k, v):
        out = flash_attention_trainable(q, k, v, bias, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, bias)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for f, r in zip(gf, gr):
        assert f.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(f, np.float32)).all()
        np.testing.assert_allclose(np.asarray(f, np.float32), np.asarray(r),
                                   atol=0.12, rtol=0.12)


def test_trainable_grad_through_padded_tail_is_zero():
    """Key positions masked by the bias must get zero dK/dV."""
    q, k, v, bias = _inputs(seed=9)          # bias masks keys 40: on sample 0
    (dq, dk, dv), _ = _grad_pair(q, k, v, bias, causal=False)
    np.testing.assert_allclose(np.asarray(dk)[0, :, 40:], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv)[0, :, 40:], 0.0, atol=1e-6)
