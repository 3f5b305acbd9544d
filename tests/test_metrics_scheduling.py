"""Attention metrics + schedules."""
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.utils.metrics import (attention_jumps_score,
                                              attention_peak_score,
                                              attention_score,
                                              batch_diagonal_mask)
from transformertts_tpu.utils.scheduling import (piecewise_linear_schedule,
                                                 reduction_schedule)


def _diag_attention(B=1, H=1, M=8, N=8):
    att = np.zeros((B, H, M, N), np.float32)
    for i in range(M):
        att[:, :, i, min(i, N - 1)] = 1.0
    return jnp.asarray(att)


def test_perfect_diagonal_scores():
    att = _diag_attention()
    mel_len = jnp.asarray([8])
    phon_len = jnp.asarray([8])
    loc, peak, diag = attention_score(att, mel_len, phon_len, r=1)
    np.testing.assert_allclose(np.asarray(loc), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(peak), 1.0, atol=1e-6)
    assert float(diag[0, 0]) > 1.0  # 3/diagonality is large for a clean diagonal


def test_jumpy_attention_scores_lower():
    att = np.zeros((1, 1, 8, 8), np.float32)
    rng = np.random.default_rng(0)
    for i in range(8):
        att[0, 0, i, rng.integers(0, 8)] = 1.0
    jumpy = float(attention_jumps_score(jnp.asarray(att), jnp.asarray([8]), r=1)[0, 0])
    clean = float(attention_jumps_score(_diag_attention(), jnp.asarray([8]), r=1)[0, 0])
    assert jumpy < clean


def test_peak_score_uniform_attention():
    att = jnp.full((1, 1, 4, 4), 0.25)
    peak = float(attention_peak_score(att, jnp.asarray([4]))[0, 0])
    np.testing.assert_allclose(peak, 0.25, atol=1e-6)


def test_diagonal_mask_zero_on_diagonal_and_outside():
    mask = np.asarray(batch_diagonal_mask((1, 1, 4, 4), jnp.asarray([4]),
                                          jnp.asarray([2])))
    # outside valid rectangle (phonemes >= 2) must be exactly 0
    assert np.all(mask[0, 0, :, 2:] == 0)
    # normalized diagonal cells have low values
    assert mask[0, 0, 0, 0] == 0


def test_piecewise_linear_schedule():
    sched = [(0, 0.0), (10, 1.0), (20, 0.5)]
    np.testing.assert_allclose(float(piecewise_linear_schedule(5, sched)), 0.5)
    np.testing.assert_allclose(float(piecewise_linear_schedule(15, sched)), 0.75)
    np.testing.assert_allclose(float(piecewise_linear_schedule(100, sched)), 0.5)
    np.testing.assert_allclose(float(piecewise_linear_schedule(0, sched)), 0.0)


def test_reduction_schedule():
    sched = [(0, 10), (80_000, 5), (100_000, 2), (130_000, 1)]
    assert reduction_schedule(0, sched) == 10
    assert reduction_schedule(79_999, sched) == 10
    assert reduction_schedule(80_000, sched) == 5
    assert reduction_schedule(200_000, sched) == 1


def test_diagonal_mask_finite_with_zero_length_sample():
    """Ragged bucket batches contain all-padding samples (length 0); the
    diagonal mask must be all-zero there, never inf/NaN — with diagonal
    forcing on, one NaN would poison all aligner gradients."""
    mask = np.asarray(batch_diagonal_mask(
        (2, 1, 6, 6), jnp.asarray([6, 0]), jnp.asarray([4, 0])))
    assert np.all(np.isfinite(mask))
    assert np.all(mask[1] == 0)


def test_attention_score_finite_with_zero_mass_sample():
    att = np.zeros((2, 2, 8, 8), np.float32)
    att[0] = np.asarray(_diag_attention(H=2))[0]
    loc, peak, diag = attention_score(
        jnp.asarray(att), jnp.asarray([8, 0]), jnp.asarray([8, 0]), r=1)
    for x in (loc, peak, diag):
        assert np.all(np.isfinite(np.asarray(x)))
