import numpy as np
import jax.numpy as jnp
import pytest

from transformertts_tpu.audio import spectral, griffinlim, pitch, vad, Audio, MelGAN, WaveRNN

SR, NFFT, HOP, WIN, MELS, FMIN, FMAX = 22050, 1024, 256, 1024, 80, 0, 8000


def _tone(freq=440.0, dur=0.5, sr=SR):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_stft_matches_torch():
    torch = pytest.importorskip('torch')
    y = _tone()
    D_np = spectral.stft_np(y, NFFT, HOP, WIN)
    t_D = torch.stft(torch.from_numpy(y), n_fft=NFFT, hop_length=HOP,
                     win_length=WIN, window=torch.hann_window(WIN, periodic=True),
                     center=True, pad_mode='reflect', return_complex=True)
    t_D = t_D.numpy().T  # torch is (bins, frames)
    assert D_np.shape == t_D.shape
    np.testing.assert_allclose(np.abs(D_np), np.abs(t_D), atol=1e-3)


def test_jnp_stft_matches_numpy():
    y = _tone()
    D_np = np.abs(spectral.stft_np(y, NFFT, HOP, WIN))
    mag = spectral.stft_magnitude(jnp.asarray(y), NFFT, HOP, WIN)
    np.testing.assert_allclose(np.asarray(mag), D_np, atol=2e-3)


def test_mel_filterbank_invariants():
    fb = spectral.mel_filterbank(SR, NFFT, MELS, FMIN, FMAX)
    assert fb.shape == (MELS, 1 + NFFT // 2)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()
    # filters are band-limited below f_max bin
    fmax_bin = int(np.ceil(FMAX / (SR / 2) * (NFFT // 2)))
    assert fb[:, fmax_bin + 2:].sum() == 0
    # slaney mel: first breakpoint linear region → filter peaks increase
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()


def test_mel_spectrogram_jnp_matches_np():
    y = _tone()
    m_np = spectral.mel_spectrogram_np(y, SR, NFFT, HOP, WIN, MELS, FMIN, FMAX)
    m_j = spectral.mel_spectrogram(jnp.asarray(y), SR, NFFT, HOP, WIN, MELS, FMIN, FMAX)
    assert m_np.shape == m_j.shape
    np.testing.assert_allclose(np.asarray(m_j), m_np, atol=5e-3)
    # a 440 Hz tone peaks in the right mel bin region
    peak_bin = m_np.mean(axis=0).argmax()
    assert 5 < peak_bin < 25


def test_istft_roundtrip():
    # recoverable length is hop * (n_frames - 1)
    y = _tone(dur=0.3)
    re, im = spectral.stft(jnp.asarray(y), NFFT, HOP, WIN)
    y_rec = np.asarray(spectral.istft(re, im, NFFT, HOP, WIN))
    np.testing.assert_allclose(y_rec, y[:len(y_rec)], atol=1e-3)


def test_istft_np_roundtrip():
    y = _tone(dur=0.3)
    D = spectral.stft_np(y, NFFT, HOP, WIN)
    y_rec = spectral.istft_np(D, NFFT, HOP, WIN)
    np.testing.assert_allclose(y_rec, y[:len(y_rec)], atol=1e-6)


def test_griffin_lim_reconstructs_tone():
    y = _tone(freq=220.0, dur=0.4)
    S = np.abs(spectral.stft_np(y, NFFT, HOP, WIN)).astype(np.float32)
    wav = griffinlim.griffin_lim(jnp.asarray(S), 32, NFFT, HOP, WIN)
    wav = np.asarray(wav)
    # spectral match: reconstructed magnitude close to target
    S_rec = np.abs(spectral.stft_np(wav, NFFT, HOP, WIN))
    err = np.linalg.norm(S_rec[4:-4] - S[4:-4]) / np.linalg.norm(S[4:-4])
    # GL phase recovery is chaotic w.r.t. fp rounding order, so the exact
    # error shifts when the ISTFT graph changes; 0.2 is comfortably within
    # usable reconstruction quality for a pure tone at 32 iterations
    assert err < 0.2


def test_mel_to_linear_pinv():
    y = _tone()
    S = np.abs(spectral.stft_np(y, NFFT, HOP, WIN))
    fb = spectral.mel_filterbank(SR, NFFT, MELS, FMIN, FMAX)
    mel = S @ fb.T
    S_rec = griffinlim.mel_to_linear(jnp.asarray(mel, jnp.float32), SR, NFFT, FMIN, FMAX)
    # projecting back to mel must be close to original mel
    mel_rec = np.asarray(S_rec) @ fb.T
    err = np.linalg.norm(mel_rec - mel) / np.linalg.norm(mel)
    assert err < 0.05


def test_normalizers_roundtrip():
    # WaveRNN's dB scaling clips outside [1e-5, 1], so test within that range
    S = np.random.RandomState(0).uniform(1e-4, 0.9, (10, 80)).astype(np.float32)
    for norm in (MelGAN(), WaveRNN()):
        S_n = norm.normalize(S)
        S_d = norm.denormalize(S_n)
        np.testing.assert_allclose(S_d, S, rtol=1e-3, atol=1e-4)


def test_pitch_on_tone():
    f0 = pitch.extract_pitch_np(_tone(freq=220.0, dur=0.5), SR, HOP)
    assert len(f0) == 1 + int(SR * 0.5) // HOP
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.7 * len(f0)
    med = np.median(voiced)
    assert abs(med - 220.0) < 5.0, f'median pitch {med}'


def test_pitch_silence_unvoiced():
    f0 = pitch.extract_pitch_np(np.zeros(8000, np.float32), SR, HOP)
    assert (f0 == 0).all()


def test_pitch_no_octave_error_on_harmonic_tone():
    """Regression: global-argmin lag selection picked the deeper CMND dip
    at 2τ (octave down) whenever 2·sr/f0 fit the search band — classic YIN
    takes the FIRST below-threshold dip instead. 188 Hz with a strong 2nd
    harmonic previously came back as 94 Hz."""
    t = np.arange(int(SR * 0.8)) / SR
    for f0t in (187.9, 251.3):
        wav = (0.5 * np.sin(2 * np.pi * f0t * t)
               + 0.2 * np.sin(2 * np.pi * 2 * f0t * t)).astype(np.float32)
        est = pitch.extract_pitch_np(wav, SR, HOP)
        voiced = est[est > 0]
        assert len(voiced) > 0.7 * len(est)
        cents = 1200 * np.abs(np.log2(voiced / f0t))
        assert np.median(cents) < 20, (f0t, np.median(cents))


def test_pitch_on_naturalistic_voice():
    """YIN accuracy bound under natural-voice signal properties (jitter,
    shimmer, formant resonances, spectral tilt, breath noise) against exact
    synthetic truth — measured 6.7-7.3 cents MAE across 120/180/240 Hz
    (scripts/measure_dsp_fidelity.py, pitch_yin_vs_truth_natural_voice).
    One base frequency here to keep the suite fast; bound is 2x the
    measured value."""
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        'measure_dsp_fidelity',
        Path(__file__).parent.parent / 'scripts' / 'measure_dsp_fidelity.py')
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    wav, f0_true, voiced = m.synth_natural_speech(
        1.2, 180.0, seed=2, unvoiced=((0.5, 0.7),))
    est = pitch.extract_pitch_np(wav, m.SR, m.HOP)
    centers = (np.arange(len(est)) * m.HOP + m.HOP // 2).clip(0, len(wav) - 1)
    v_true, v_est = voiced[centers], est > 0
    assert np.mean(v_est == v_true) > 0.9
    both = v_est & v_true
    cents = 1200 * np.abs(np.log2(est[both] / f0_true[centers][both]))
    assert np.mean(cents) < 15, f'natural-voice MAE {np.mean(cents):.1f} cents'


def test_vad_trims_silence():
    sr = 16000
    speech = _tone(freq=200, dur=0.5, sr=sr)
    silence = np.zeros(sr, np.float32)
    wav = np.concatenate([silence, speech, silence])
    trimmed = vad.trim_long_silences(wav, sr, window_ms=30,
                                     moving_average_width=8, max_silence_length=12)
    assert len(trimmed) < len(wav)
    assert len(trimmed) >= len(speech) * 0.8


def test_trim_silence_top_db():
    wav = np.concatenate([np.zeros(2000, np.float32), _tone(dur=0.2),
                          np.zeros(2000, np.float32)])
    trimmed = vad.trim_silence_top_db(wav, top_db=40)
    assert len(trimmed) < len(wav)
    assert np.abs(trimmed).max() == np.abs(wav).max()


def test_audio_class_end_to_end(tmp_path):
    audio = Audio(sampling_rate=SR, n_fft=NFFT, mel_channels=MELS,
                  hop_length=HOP, win_length=WIN, f_min=FMIN, f_max=FMAX,
                  normalizer='MelGAN', norm_wav=True, target_dBFS=-30,
                  int16_max=32767, trim_long_silences=False, trim_silence=False,
                  trim_silence_top_db=60)
    y = _tone(dur=0.4)
    mel = audio.mel_spectrogram(y)
    assert mel.shape[1] == MELS
    assert mel.shape[0] == 1 + len(y) // HOP
    wav = audio.reconstruct_waveform(mel, n_iter=8)
    assert len(wav) > 0
    p = tmp_path / 'out.wav'
    audio.save_wav(wav, p)
    y2, sr = audio.load_wav(p, preprocess=False)
    assert sr == SR and len(y2) > 0
    # config roundtrip
    audio2 = Audio.from_config(audio.config)
    assert audio2.sampling_rate == SR


def test_audio_accepts_reference_mel_orientation():
    audio = Audio(sampling_rate=SR, n_fft=NFFT, mel_channels=MELS,
                  hop_length=HOP, win_length=WIN, f_min=FMIN, f_max=FMAX,
                  normalizer='MelGAN')
    y = _tone(dur=0.3)
    mel = audio.mel_spectrogram(y)  # (frames, mels)
    w1 = audio.reconstruct_waveform(mel, n_iter=2)
    w2 = audio.reconstruct_waveform(mel.T, n_iter=2)  # reference passes (mels, frames)
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_vad_trims_noisy_silence():
    """A fixed -48 dB gate keeps recording hiss; the adaptive bimodal
    threshold must trim noisy internal silence without losing speech."""
    from transformertts_tpu.audio import vad
    sr = 22050
    rng = np.random.default_rng(0)
    t1 = np.arange(int(0.8 * sr)) / sr
    speech1 = 0.5 * np.sin(2 * np.pi * 140 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t1))
    speech2 = 0.5 * np.sin(2 * np.pi * 200 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t1))
    silence = np.zeros(int(1.2 * sr))
    wav = np.concatenate([speech1, silence, speech2]).astype(np.float32)
    noise_rms = np.sqrt(np.mean(wav ** 2)) / 10 ** (20 / 20)   # 20 dB SNR
    wav = wav + noise_rms * rng.standard_normal(len(wav)).astype(np.float32)
    trimmed = vad.trim_long_silences(wav, sr, 30, 8, 6)
    kept_s = len(trimmed) / sr
    assert kept_s >= 1.55, 'speech was lost'
    assert kept_s <= 2.0, f'noisy silence survived ({kept_s:.2f}s kept)'


def test_vad_all_speech_clip_untouched():
    """With no clear silence mode the adaptive threshold must fall back to
    the conservative gate and keep (almost) everything."""
    from transformertts_tpu.audio import vad
    sr = 22050
    t = np.arange(int(1.5 * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 150 * t)
           * (0.7 + 0.3 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    trimmed = vad.trim_long_silences(wav, sr, 30, 8, 6)
    assert len(trimmed) >= 0.95 * (len(wav) - len(wav) % ((30 * sr) // 1000))


def test_vad_anchor_stage_safety():
    """The round-5 speech-anchor stage must never cut real speech content:
    (a) short unvoiced (fricative-like) spans inside speech are shorter than
    the 14-window non-speech run threshold and survive; (b) a clip with no
    anchors at all (non-harmonic content) keeps the pure energy-gate
    behavior instead of being classified."""
    from transformertts_tpu.audio import vad
    sr = 22050
    spw = (30 * sr) // 1000
    rng = np.random.default_rng(11)
    # (a) voiced | 0.3 s fricative hiss | voiced — all speech. The 0.3 s
    # unvoiced span is a 10-11 window anchor-free run, under the 14-window
    # non-speech threshold: the anchor stage must never cut a window the
    # energy gate kept, and at fricative-realistic levels the clip survives
    # whole.
    t1 = np.arange(int(0.6 * sr)) / sr
    v1 = 0.5 * np.sin(2 * np.pi * 150 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t1))
    v2 = 0.5 * np.sin(2 * np.pi * 190 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t1))
    fric = 0.3 * np.convolve(rng.standard_normal(int(0.3 * sr)),
                             np.ones(8) / 8, mode='same')
    wav = np.concatenate([v1, fric, v2]).astype(np.float32)
    usable_sp = wav[:len(wav) - (len(wav) % spw)]
    flags_sp = vad.detect_voice_flags(usable_sp, sr, 30)
    fr_sp = usable_sp.reshape(-1, spw)
    rms_sp = np.sqrt(np.mean(fr_sp ** 2, axis=-1) + 1e-12)
    ref_sp = np.percentile(rms_sp, 95) + 1e-12
    energy_sp = (20.0 * np.log10(rms_sp / ref_sp)
                 > vad.adaptive_threshold_db(rms_sp, ref_sp))
    assert not (energy_sp & ~flags_sp).any(), \
        'anchor stage cut a window the energy gate kept (run < 14 windows)'
    trimmed = vad.trim_long_silences(wav, sr, 30, 8, 6)
    assert len(trimmed) >= 0.95 * len(usable_sp), \
        'unvoiced speech span was cut'
    # (b) pure-noise "speech" (no periodicity anywhere): flags must equal
    # the plain energy decision — the classifier must not engage
    noise = np.concatenate([
        0.3 * rng.standard_normal(sr // 2),
        0.0005 * rng.standard_normal(sr),
        0.3 * rng.standard_normal(sr // 2)]).astype(np.float32)
    usable = noise[:len(noise) - (len(noise) % spw)]
    flags = vad.detect_voice_flags(usable, sr, 30)
    frames = usable.reshape(-1, spw)
    rms = np.sqrt(np.mean(frames ** 2, axis=-1) + 1e-12)
    ref = np.percentile(rms, 95) + 1e-12
    db = 20.0 * np.log10(rms / ref)
    energy_only = db > vad.adaptive_threshold_db(rms, ref)
    np.testing.assert_array_equal(flags, energy_only)


def test_vad_structured_noise_gap():
    """Discrimination vs structured (non-stationary) noise, the case the
    reference's webrtcvad GMM handles by classification: with the round-5
    speech-anchor stage (periodicity + modulation, audio/vad.py) the babble
    gap must be trimmed at BOTH quiet and loud levels — level-independent,
    like the GMM — and speech must always survive (measured sweep:
    scripts/measure_dsp_fidelity.py, vad_structured_noise: ~90% gap removed,
    0 ms speech lost at -30/-20/-10 dB for babble/music/keyboard)."""
    from transformertts_tpu.audio import vad
    sr = 22050
    rng = np.random.default_rng(7)
    t1 = np.arange(int(0.8 * sr)) / sr
    speech1 = 0.5 * np.sin(2 * np.pi * 140 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t1))
    speech2 = 0.5 * np.sin(2 * np.pi * 200 * t1) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t1))
    tg = np.arange(int(1.2 * sr)) / sr
    babble = sum(np.sin(2 * np.pi * f0 * tg + rng.uniform(0, 2 * np.pi))
                 * (0.6 + 0.4 * np.sin(2 * np.pi * rate * tg))
                 for f0, rate in ((95, 2.1), (150, 3.3), (220, 1.7), (300, 2.9)))
    babble /= np.abs(babble).max()
    speech_rms = np.sqrt(np.mean(np.concatenate([speech1, speech2]) ** 2))
    for gap_db, max_kept in ((-25.0, 2.0), (-6.0, 2.0)):
        gap = babble * speech_rms / np.sqrt(np.mean(babble ** 2)) * 10 ** (gap_db / 20)
        wav = np.concatenate([speech1, gap, speech2]).astype(np.float32)
        kept_s = len(vad.trim_long_silences(wav, sr, 30, 8, 6)) / sr
        assert kept_s >= 1.5, f'speech lost at gap {gap_db} dB ({kept_s:.2f}s kept)'
        assert kept_s <= max_kept, f'quiet babble gap survived ({kept_s:.2f}s kept)'


def test_griffin_lim_beats_prose_claim():
    """Measured GL fidelity guard: pinv + multiplicative-NNLS + zero-phase
    device GL must reconstruct a harmonic signal with spectral convergence
    < 0.3 and mel-roundtrip error < 0.2 (cf. reference NNLS+random-phase
    at 0.247 / 0.197 — scripts/measure_dsp_fidelity.py)."""
    import jax.numpy as jnp
    from transformertts_tpu.audio import griffinlim, spectral
    sr, n_fft, hop, win, mels = 22050, 1024, 256, 1024, 80
    t = np.arange(sr) / sr
    phase = np.cumsum(2 * np.pi * (150 + 30 * np.sin(2 * np.pi * 2.5 * t)) / sr)
    y = sum(0.5 / k * np.sin(k * phase) for k in range(1, 9)).astype(np.float32)
    S_true = np.abs(spectral.stft_np(y, n_fft, hop, win)).astype(np.float32)
    fb = spectral.mel_filterbank(sr, n_fft, mels, 0, 8000)
    mel_amp = (S_true @ fb.T).astype(np.float32)
    S = griffinlim.mel_to_linear(jnp.asarray(mel_amp), sr, n_fft, 0, 8000)
    wav = np.asarray(griffinlim.griffin_lim(S, 32, n_fft, hop, win))
    R = np.abs(spectral.stft_np(wav, n_fft, hop, win))[:S_true.shape[0]]
    sc = np.linalg.norm(S_true - R) / np.linalg.norm(S_true)
    mel_rt = np.mean(np.abs(R @ fb.T - mel_amp)) / np.mean(mel_amp)
    assert sc < 0.3, sc
    assert mel_rt < 0.2, mel_rt


def test_wavernn_audio_regime():
    """The WaveRNN data regime (config/data_config_wavernn.yaml, ported from
    the reference's flat-format file): 2048-point FFT at hop 275 / win 1100,
    f_min 40 / f_max null (Nyquist), WaveRNN dB normalization."""
    torch = pytest.importorskip('torch')
    sr, n_fft, hop, win, mels = 22050, 2048, 275, 1100, 80
    y = _tone(dur=0.4)
    # STFT parity vs torch at win < n_fft (centered zero-padded window)
    D_np = spectral.stft_np(y, n_fft, hop, win)
    t_D = torch.stft(torch.from_numpy(y), n_fft=n_fft, hop_length=hop,
                     win_length=win, window=torch.hann_window(win, periodic=True),
                     center=True, pad_mode='reflect', return_complex=True)
    np.testing.assert_allclose(np.abs(D_np), np.abs(t_D.numpy().T), atol=1e-3)
    # f_max=None spans to Nyquist: top filter has support near the last bin
    fb = spectral.mel_filterbank(sr, n_fft, mels, 40, None)
    assert fb[:, -10:].sum() > 0
    assert fb[:, :int(40 / (sr / 2) * (n_fft // 2)) - 1].sum() == 0
    # full Audio path with the WaveRNN normalizer round-trips
    audio = Audio(sampling_rate=sr, n_fft=n_fft, mel_channels=mels,
                  hop_length=hop, win_length=win, f_min=40, f_max=None,
                  normalizer='WaveRNN')
    mel = audio.mel_spectrogram(y)
    assert mel.shape == (1 + len(y) // hop, mels)
    assert np.isfinite(mel).all() and np.abs(mel).max() <= 4.0 + 1e-6
    wav = audio.reconstruct_waveform(mel, n_iter=4)
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_wavernn_data_config_loads():
    """config/data_config_wavernn.yaml parses for both model kinds and keys
    the artifact dirs by the WaveRNN session names."""
    from pathlib import Path
    from transformertts_tpu.utils.config import TrainingConfigManager
    cfg = Path(__file__).parent.parent / 'config/data_config_wavernn.yaml'
    for aligner in (True, False):
        cm = TrainingConfigManager(cfg, aligner=aligner)
        assert cm.config['n_fft'] == 2048
        assert cm.config['hop_length'] == 275
        assert cm.config['f_max'] is None
        assert cm.config['normalizer'] == 'WaveRNN'
        assert cm.config['model_breathing'] is False
        assert 'WaveRNN_default' in str(cm.mel_dir)
        audio = Audio.from_config(cm.config)
        assert audio.normalizer.__class__.__name__ == 'WaveRNN'


def test_reconstruct_waveform_batch_degenerate_mel():
    """A 1-frame mel batch must edge-pad like the single-sample path, not
    silently return empty waveforms."""
    audio = Audio(sampling_rate=SR, n_fft=512, mel_channels=20,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=2)
    mels = np.random.default_rng(0).standard_normal((2, 1, 20)).astype(np.float32)
    wavs = audio.reconstruct_waveform_batch(mels, n_iter=2)
    assert wavs.shape[0] == 2 and wavs.shape[1] > 0
    assert np.all(np.isfinite(wavs))


def test_dataset_empty_raises():
    from transformertts_tpu.data.datasets import BucketedDataset
    ds = BucketedDataset([], load_fn=lambda s: {}, len_fn=lambda d: 1,
                         mel_channels=4, bucket_boundaries=[10],
                         bucket_batch_sizes=[2, 2])
    with pytest.raises(RuntimeError, match='no batches'):
        ds.next_batch()
