"""Quantify the DSP-replacement fidelity claims (BASELINE.md).

The reference leans on native DSP libs this image does not ship (librosa
NNLS mel inversion + random-phase Griffin-Lim, pyworld DIO/StoneMask pitch,
webrtcvad trimming). This script replaces the round-1 prose claims with
measured numbers:

(a) Griffin-Lim: our on-device pinv/zero-phase GL vs a faithful
    reimplementation of the reference's NNLS + random-phase host GL
    (scipy.optimize.nnls per frame — numerically what librosa's
    ``mel_to_stft`` solves), on IDENTICAL mels. Metrics: spectral
    convergence to the true magnitude STFT and mel-roundtrip L1.
(b) Pitch: batched YIN vs *known ground truth* on synthetic speech
    (glottal-pulse harmonics with vibrato + unvoiced noise segments —
    stronger than a pyworld cross-check, since truth is exact).
    Metrics: voiced/unvoiced agreement, mean |cents| error on voiced frames.
(c) VAD: adaptive-energy trim vs known speech/silence annotations at
    several SNRs. Metrics: boundary error (ms), retained-speech fraction,
    long-silence removal.

Run: python scripts/measure_dsp_fidelity.py
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SR = 22050
N_FFT, HOP, WIN, N_MELS = 1024, 256, 1024, 80


def synth_speech(seconds=2.0, f0_base=150.0, seed=0, unvoiced=()):
    """Speech-like: harmonic glottal source with vibrato + AM envelope;
    ``unvoiced`` time spans are replaced with shaped noise. Returns
    (wav, f0_track_fn, voiced_fn)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    f0 = f0_base * (1 + 0.15 * np.sin(2 * np.pi * 0.8 * t)) \
        + 4.0 * np.sin(2 * np.pi * 5.5 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    y = sum((0.6 / k) * np.sin(k * phase) for k in range(1, 10))
    y *= 0.55 + 0.45 * np.sin(2 * np.pi * 1.3 * t + 1.0)
    voiced = np.ones(len(t), bool)
    for (a, b) in unvoiced:
        m = (t >= a) & (t < b)
        n = rng.standard_normal(m.sum())
        n = np.convolve(n, np.ones(8) / 8, mode='same')   # hiss-ish
        y[m] = 0.3 * n
        voiced[m] = False
    y += 0.003 * rng.standard_normal(len(t))
    y = (y / np.abs(y).max()).astype(np.float32)
    return y, f0, voiced


# --------------------------------------------------------------- (a) GL

def reference_nnls_random_gl(mel_amp, n_iter=32, seed=0):
    """The reference's reconstruction, reimplemented faithfully:
    librosa.feature.inverse.mel_to_stft solves NNLS per frame
    (min ||fb @ s - m||, s >= 0), then griffinlim with random phase init
    and momentum 0.99 (librosa defaults used by data/audio.py:94-110)."""
    from scipy.optimize import nnls
    from transformertts_tpu.audio import spectral
    fb = spectral.mel_filterbank(SR, N_FFT, N_MELS, 0, 8000)   # (M, B)
    S = np.stack([nnls(fb, m)[0] for m in mel_amp])            # (T, B)
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(S.shape))
    rebuilt = np.zeros_like(S, dtype=complex)
    momentum = 0.99
    for _ in range(n_iter):
        tprev = rebuilt
        y = spectral.istft_np(S * angles, N_FFT, HOP, WIN)
        rebuilt = spectral.stft_np(y, N_FFT, HOP, WIN)[:S.shape[0]]
        angles = rebuilt - (momentum / (1 + momentum)) * tprev
        angles /= np.abs(angles) + 1e-16
    return spectral.istft_np(S * angles, N_FFT, HOP, WIN)


def measure_gl():
    import jax.numpy as jnp
    from transformertts_tpu.audio import griffinlim, spectral
    wav, _, _ = synth_speech(2.0, 150.0, seed=0)
    S_true = np.abs(spectral.stft_np(wav, N_FFT, HOP, WIN)).astype(np.float32)
    fb = spectral.mel_filterbank(SR, N_FFT, N_MELS, 0, 8000)
    mel_amp = (S_true @ fb.T).astype(np.float32)               # (T, M)

    def metrics(y):
        y = np.asarray(y)
        R = np.abs(spectral.stft_np(y, N_FFT, HOP, WIN))[:S_true.shape[0]]
        sc = float(np.linalg.norm(S_true - R) / np.linalg.norm(S_true))
        mel_rt = R @ fb.T
        l1 = float(np.mean(np.abs(mel_rt - mel_amp)) / np.mean(mel_amp))
        return {'spectral_convergence': round(sc, 4),
                'mel_roundtrip_rel_L1': round(l1, 4)}

    S_ours = np.asarray(griffinlim.mel_to_linear(
        jnp.asarray(mel_amp), SR, N_FFT, 0, 8000))
    ours = griffinlim.griffin_lim(jnp.asarray(S_ours), 32, N_FFT, HOP, WIN)
    ref = reference_nnls_random_gl(mel_amp, 32)
    return {'ours_pinv_zerophase_device': metrics(ours),
            'reference_nnls_randomphase_host': metrics(ref)}


# ------------------------------------------------------------ (b) pitch

def measure_pitch():
    from transformertts_tpu.audio import Audio
    audio = Audio(sampling_rate=SR, n_fft=N_FFT, mel_channels=N_MELS,
                  hop_length=HOP, win_length=WIN, f_min=0, f_max=8000,
                  normalizer='MelGAN')
    rows = []
    for f0b, seed in ((120.0, 1), (180.0, 2), (240.0, 3)):
        wav, f0_true, voiced = synth_speech(
            2.0, f0b, seed=seed, unvoiced=((0.6, 0.9), (1.5, 1.7)))
        est = np.asarray(audio.extract_pitch(wav))
        n = len(est)
        centers = (np.arange(n) * HOP + HOP // 2).clip(0, len(wav) - 1)
        truth = f0_true[centers]
        v_true = voiced[centers]
        v_est = est > 0
        agree = float(np.mean(v_est == v_true))
        both = v_est & v_true
        cents = 1200 * np.abs(np.log2(est[both] / truth[both]))
        rows.append({'f0_base': f0b, 'vuv_agreement': round(agree, 3),
                     'mean_abs_cents': round(float(np.mean(cents)), 1),
                     'median_abs_cents': round(float(np.median(cents)), 1)})
    return rows


# -------------------------------------------------------------- (c) VAD

def measure_vad():
    from transformertts_tpu.audio import vad
    rng = np.random.default_rng(0)
    rows = []
    for snr_db in (40.0, 20.0, 10.0):
        # 0.8 s speech | 1.2 s silence | 0.8 s speech
        sp1, _, _ = synth_speech(0.8, 140.0, seed=4)
        sp2, _, _ = synth_speech(0.8, 200.0, seed=5)
        sil = np.zeros(int(1.2 * SR), np.float32)
        wav = np.concatenate([sp1, sil, sp2])
        noise = rng.standard_normal(len(wav)).astype(np.float32)
        noise *= np.sqrt(np.mean(wav**2)) / 10 ** (snr_db / 20)
        noisy = wav + noise
        trimmed = vad.trim_long_silences(noisy, SR, 30, 8, 6)
        speech_s = 1.6
        kept_s = len(trimmed) / SR
        # how much of the 1.2 s silence survived
        silence_kept = max(0.0, kept_s - speech_s)
        rows.append({'snr_db': snr_db,
                     'kept_s': round(kept_s, 3),
                     'speech_s': speech_s,
                     'silence_kept_s': round(silence_kept, 3),
                     'speech_lost_s': round(max(0.0, speech_s - kept_s), 3)})
    return rows


def main():
    results = {'griffin_lim': measure_gl(),
               'pitch_yin_vs_truth': measure_pitch(),
               'vad_energy_trim': measure_vad()}
    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
