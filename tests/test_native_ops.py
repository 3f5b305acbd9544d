"""Native C++ ops vs the Python/JAX implementations."""
import numpy as np
import pytest

from transformertts_tpu import native
from transformertts_tpu.ops.duration_extraction import extract_durations_with_dp
from transformertts_tpu.audio.vad import trim_long_silences

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native lib unavailable')


def test_duration_dp_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(5):
        attn = rng.random((40, 11)).astype(np.float32)
        cost = attn.max() - attn
        ours = native.duration_dp(cost)
        ref = extract_durations_with_dp(attn)
        assert ours.sum() == 40
        np.testing.assert_array_equal(ours, ref)


def test_duration_dp_batch():
    rng = np.random.default_rng(1)
    b, m_pad, n_pad = 4, 50, 16
    costs = np.full((b, m_pad, n_pad), 1e9, np.float32)
    ms = np.asarray([50, 30, 44, 12], np.int32)
    ns = np.asarray([16, 9, 11, 4], np.int32)
    refs = []
    for i in range(b):
        attn = rng.random((ms[i], ns[i])).astype(np.float32)
        costs[i, :ms[i], :ns[i]] = attn.max() - attn
        refs.append(extract_durations_with_dp(attn))
    out = native.duration_dp_batch(costs, ms, ns)
    for i in range(b):
        assert out[i, :ns[i]].sum() == ms[i]
        np.testing.assert_array_equal(out[i, :ns[i]], refs[i])
        assert (out[i, ns[i]:] == 0).all()


def test_vad_mask_matches_python():
    rng = np.random.default_rng(2)
    sr = 16000
    # speech / silence / speech
    wav = np.concatenate([
        0.3 * rng.standard_normal(sr // 2),
        0.0005 * rng.standard_normal(sr),
        0.3 * rng.standard_normal(sr // 2)]).astype(np.float32)
    kwargs = dict(sampling_rate=sr, window_ms=30, moving_average_width=8,
                  max_silence_length=12)
    ref = trim_long_silences(wav, sr, 30, 8, 12)
    spw = 30 * sr // 1000
    trimmed_input = wav[:len(wav) - (len(wav) % spw)]
    mask = native.vad_long_silence_mask(trimmed_input, sr, 30, 8, 12)
    ours = trimmed_input[mask]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref)


def test_vad_mask_matches_python_with_speech_anchors():
    """The speech-anchor classification stage (periodicity + modulation,
    audio/vad.py round 5) must agree between C++ and NumPy on a clip that
    actually has anchors: harmonic AM speech around a loud babble-like gap
    (the case the anchor stage exists for)."""
    from transformertts_tpu.audio import vad
    rng = np.random.default_rng(3)
    sr = 22050
    t1 = np.arange(int(0.8 * sr)) / sr
    speech1 = (0.5 * np.sin(2 * np.pi * 140 * t1)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t1)))
    speech2 = (0.5 * np.sin(2 * np.pi * 200 * t1)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t1)))
    tg = np.arange(int(1.2 * sr)) / sr
    gap = sum(np.sin(2 * np.pi * f0 * tg + rng.uniform(0, 2 * np.pi))
              * (0.6 + 0.4 * np.sin(2 * np.pi * rate * tg))
              for f0, rate in ((95, 2.1), (150, 3.3), (220, 1.7), (300, 2.9)))
    gap = 0.25 * gap / np.abs(gap).max()
    wav = np.concatenate([speech1, gap, speech2]).astype(np.float32)
    spw = 30 * sr // 1000
    usable = wav[:len(wav) - (len(wav) % spw)]
    # NumPy chain, explicitly (trim_long_silences would prefer native)
    flags = vad.detect_voice_flags(usable, sr, 30).astype(float)
    ref_mask = np.repeat(vad._binary_dilation(
        np.round(vad._moving_average(flags, 8)).astype(bool), 7), spw)
    native_mask = native.vad_long_silence_mask(usable, sr, 30, 8, 6)
    np.testing.assert_array_equal(native_mask, ref_mask)
    # sanity: the anchor stage actually fired (gap trimmed, speech kept)
    assert ref_mask[:len(speech1)].mean() > 0.9
    assert ref_mask[len(speech1):len(speech1) + len(tg)].mean() < 0.5
