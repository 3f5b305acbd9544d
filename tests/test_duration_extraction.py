"""Duration extraction: scan-DP distance table vs brute force, durations."""
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.ops.duration_extraction import (
    dist_table, duration_to_alignment_matrix, extract_durations_with_dp,
    get_durations_from_alignment)


def brute_force_dist(cost):
    m, n = cost.shape
    d = np.full((m, n), np.inf)
    d[0, 0] = cost[0, 0]
    for i in range(m):
        for j in range(n):
            if i == 0 and j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, d[i - 1, j])
            if j > 0:
                best = min(best, d[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, d[i - 1, j - 1])
            d[i, j] = cost[i, j] + best
    return d


def brute_force_durations(cost):
    d = brute_force_dist(cost)
    m, n = cost.shape
    i, j = m - 1, n - 1
    last_col = np.full(m, -1, np.int64)
    last_col[i] = j
    while i > 0 or j > 0:
        cands = [d[i - 1, j - 1] if i > 0 and j > 0 else np.inf,
                 d[i - 1, j] if i > 0 else np.inf,
                 d[i, j - 1] if j > 0 else np.inf]
        k = int(np.argmin(cands))
        i, j = (i - 1, j - 1) if k == 0 else ((i - 1, j) if k == 1 else (i, j - 1))
        if last_col[i] < 0:
            last_col[i] = j
    dur = np.zeros(n, np.int64)
    for r in range(m):
        dur[last_col[r]] += 1
    return dur


def test_dist_table_matches_brute_force():
    rng = np.random.default_rng(0)
    cost = rng.random((17, 9)).astype(np.float32)
    ours = np.asarray(dist_table(jnp.asarray(cost)))
    ref = brute_force_dist(cost)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_durations_match_brute_force():
    rng = np.random.default_rng(1)
    for _ in range(5):
        attn = rng.random((23, 7)).astype(np.float32)
        cost = attn.max() - attn
        ours = extract_durations_with_dp(attn)
        ref = brute_force_durations(cost)
        assert ours.sum() == 23
        np.testing.assert_array_equal(ours, ref)


def test_diagonal_attention_gives_even_durations():
    m, n = 20, 5
    attn = np.zeros((m, n), np.float32)
    for i in range(m):
        attn[i, min(i // 4, n - 1)] = 1.0
    dur = extract_durations_with_dp(attn)
    assert dur.sum() == m
    np.testing.assert_array_equal(dur, [4, 4, 4, 4, 4])


def test_duration_to_alignment_matrix():
    mat = duration_to_alignment_matrix(np.asarray([2, 1, 3]))
    assert mat.shape == (3, 6)
    np.testing.assert_array_equal(mat[0], [1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(mat[1], [0, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(mat[2], [0, 0, 0, 1, 1, 1])


def test_get_durations_from_alignment_batch():
    rng = np.random.default_rng(2)
    b, h, m_pad, n_pad = 3, 2, 30, 12
    mels = np.zeros((b, m_pad, 8), np.float32)
    phons = np.zeros((b, n_pad), np.int32)
    attn = np.zeros((b, h, m_pad, n_pad), np.float32)
    mel_ls = [24, 30, 18]
    phon_ls = [10, 12, 6]
    for i in range(b):
        mels[i, :mel_ls[i]] = rng.standard_normal((mel_ls[i], 8))
        phons[i, :phon_ls[i]] = rng.integers(1, 40, phon_ls[i])
        # noisy diagonal attention in the valid region
        for t in range(mel_ls[i]):
            c = int(t / mel_ls[i] * phon_ls[i])
            attn[i, :, t, c] = 1.0
        attn[i] += rng.random((h, m_pad, n_pad)) * 0.01
        attn[i] /= attn[i].sum(-1, keepdims=True)
    durs, aligns, jump, peak, diag = get_durations_from_alignment(
        attn, mels, phons)
    for i in range(b):
        # reference semantics: start frame/token and end vector/token dropped
        assert durs[i].sum() == mel_ls[i] - 2
        assert len(durs[i]) == phon_ls[i] - 2
        assert aligns[i].shape == (phon_ls[i] - 2, mel_ls[i] - 2)
    assert jump.shape == (b, h)


def test_weighted_head_sum_also_valid():
    rng = np.random.default_rng(3)
    b, h, m_pad, n_pad = 1, 3, 16, 8
    mels = np.zeros((b, m_pad, 4), np.float32)
    mels[0, :14] = rng.standard_normal((14, 4))
    phons = np.zeros((b, n_pad), np.int32)
    phons[0, :6] = rng.integers(1, 20, 6)
    attn = rng.random((b, h, m_pad, n_pad)).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    durs, *_ = get_durations_from_alignment(attn, mels, phons, weighted=True)
    assert durs[0].sum() == 12


def test_native_and_device_backends_agree():
    from transformertts_tpu import native
    if not native.available():
        import pytest
        pytest.skip('native lib unavailable')
    rng = np.random.default_rng(5)
    b, h, m_pad, n_pad = 2, 2, 28, 10
    mels = np.zeros((b, m_pad, 4), np.float32)
    phons = np.zeros((b, n_pad), np.int32)
    attn = rng.random((b, h, m_pad, n_pad)).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    for i, (ml, pl_) in enumerate([(26, 9), (20, 7)]):
        mels[i, :ml] = rng.standard_normal((ml, 4))
        phons[i, :pl_] = rng.integers(1, 30, pl_)
    d_dev, *_ = get_durations_from_alignment(attn, mels, phons,
                                             backend='device')
    d_nat, *_ = get_durations_from_alignment(attn, mels, phons,
                                             backend='native')
    for a, c in zip(d_dev, d_nat):
        np.testing.assert_array_equal(a, c)
