"""On-device Griffin-Lim waveform reconstruction.

Replaces the reference's host-side ``librosa.feature.inverse.mel_to_stft`` +
``librosa.griffinlim`` (data/audio.py:94-110) — the single most expensive
inference op in the reference pipeline — with a fully jitted device loop:

- mel → linear magnitude via a precomputed pseudo-inverse of the mel
  filterbank, clipped at zero (the FreeV formulation; librosa solves an NNLS
  per frame on host instead — the pinv is a single GEMM and is within the
  same perceptual quality).
- Griffin-Lim phase recovery as a ``lax.fori_loop`` of ISTFT→STFT round
  trips with momentum (librosa's accelerated update, momentum 0.99), all
  GEMM-based on the MXU.

Deterministic zero-phase init (librosa defaults to random phase; zero phase
is reproducible and converges comparably at 32+ iterations).
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.audio import spectral


@lru_cache(maxsize=8)
def mel_pinv(sampling_rate: int, n_fft: int, n_mels: int,
             f_min: float, f_max: float) -> np.ndarray:
    """(n_mels, n_bins) pseudo-inverse of the mel filterbank."""
    fb = spectral.mel_filterbank(sampling_rate, n_fft, n_mels, f_min, f_max)
    return np.linalg.pinv(fb).T.astype(np.float32)  # (n_mels, n_bins)


def mel_to_linear(amp_mel: jax.Array, sampling_rate: int, n_fft: int,
                  f_min: float, f_max: float,
                  refine_iters: int = 10) -> jax.Array:
    """Amplitude mel (T, n_mels) → linear magnitude (T, 1 + n_fft//2).

    Pseudo-inverse init + ``refine_iters`` multiplicative NNLS updates
    (s ← s · (mᵀfb)/(s fbᵀ fb); all GEMMs, ~0.1 GFLOP total). librosa's
    ``mel_to_stft`` solves the same NNLS per frame on host; measured on a
    harmonic test signal the refined device solution reconstructs *better*
    on both spectral convergence and mel-roundtrip error
    (scripts/measure_dsp_fidelity.py: SC 0.22 vs librosa-equivalent 0.25,
    mel-roundtrip 0.12 vs 0.20 at 32 GL iterations).
    """
    mels = amp_mel.shape[-1]
    pinv = jnp.asarray(mel_pinv(sampling_rate, n_fft, mels, f_min, f_max),
                       dtype=amp_mel.dtype)
    prec = jax.lax.Precision.HIGHEST
    S = jnp.maximum(
        jnp.matmul(amp_mel, pinv, precision=prec), 1e-10)
    if refine_iters > 0:
        fb = jnp.asarray(
            spectral.mel_filterbank(sampling_rate, n_fft, mels, f_min, f_max),
            dtype=amp_mel.dtype)                        # (M, B)
        num = jnp.matmul(amp_mel, fb, precision=prec)   # (T, B)

        def body(_, S):
            den = jnp.matmul(jnp.matmul(S, fb.T, precision=prec), fb,
                             precision=prec) + 1e-10
            return S * num / den

        S = jax.lax.fori_loop(0, refine_iters, body, S)
    return jnp.maximum(S, 0.0)


@lru_cache(maxsize=8)
def _wsq_envelope(n_fft: int, hop_length: int, win_length: int,
                  n_frames: int) -> np.ndarray:
    """Squared-window overlap-add envelope over the padded signal length."""
    window = spectral.hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    out_len = n_fft + hop_length * (n_frames - 1)
    wsq = np.zeros(out_len)
    w2 = window ** 2
    for k in range(n_fft // hop_length):
        strip = np.tile(w2[k * hop_length:(k + 1) * hop_length], n_frames)
        wsq[k * hop_length:k * hop_length + strip.shape[0]] += strip
    return np.maximum(wsq, 1e-10).astype(np.float32)


@partial(jax.jit, static_argnames=('n_iter', 'n_fft', 'hop_length',
                                   'win_length', 'momentum'))
def griffin_lim(S: jax.Array, n_iter: int, n_fft: int, hop_length: int,
                win_length: int, momentum: float = 0.99) -> jax.Array:
    """Phase reconstruction from magnitude STFT S (n_frames, n_bins) → wav.

    Fast path (n_fft divisible by hop): the whole iteration runs in the
    *padded* signal domain — ISTFT lays frames down with hop-strip adds and
    STFT refames with static slices, so no gather, no reflect re-pad and no
    scatter appears inside the loop. That is ~50× faster per iteration on
    TPU than gather-based framing (the gather of n_frames·n_fft arbitrary
    indices dominated the loop). Boundary semantics: the padded edges carry
    the reconstructed signal forward instead of re-reflecting each round —
    the interior (what the caller keeps) is unaffected.
    """
    S = S.astype(jnp.float32)
    eps = 1e-16
    n_frames = S.shape[0]

    if n_fft % hop_length != 0:
        return _griffin_lim_general(S, n_iter, n_fft, hop_length, win_length,
                                    momentum)

    k_strips = n_fft // hop_length
    out_len = n_fft + hop_length * (n_frames - 1)
    re_b, im_b = spectral._idft_basis(n_fft, win_length)
    cos_b, sin_b = spectral.dft_basis(n_fft, win_length)
    re_b, im_b, cos_b, sin_b = (jnp.asarray(a, jnp.float32)
                                for a in (re_b, im_b, cos_b, sin_b))
    wsq = jnp.asarray(_wsq_envelope(n_fft, hop_length, win_length, n_frames))
    # HIGH (bf16x3) is measurably quality-identical to HIGHEST here
    # (spectral convergence 0.2248 vs 0.2245 on the fidelity harness) and
    # ~1.4x faster batched
    prec = jax.lax.Precision.HIGH

    def istft_padded(re, im):
        frames = (jnp.matmul(re, re_b, precision=prec)
                  + jnp.matmul(im, im_b, precision=prec))
        y = jnp.zeros((out_len,), jnp.float32)
        for k in range(k_strips):
            strip = frames[:, k * hop_length:(k + 1) * hop_length].reshape(-1)
            y = y.at[k * hop_length:k * hop_length + strip.shape[0]].add(strip)
        return y / wsq

    def stft_padded(y):
        cols = [jax.lax.slice(y, (k * hop_length,),
                              (k * hop_length + n_frames * hop_length,))
                .reshape(n_frames, hop_length) for k in range(k_strips)]
        frames = jnp.concatenate(cols, axis=-1)
        return (jnp.matmul(frames, cos_b, precision=prec),
                jnp.matmul(frames, sin_b, precision=prec))

    def normalize(re, im):
        mag = jnp.sqrt(re * re + im * im) + eps
        return re / mag, im / mag

    def body(_, carry):
        ang_re, ang_im, prev_re, prev_im = carry
        y = istft_padded(S * ang_re, S * ang_im)
        new_re, new_im = stft_padded(y)
        m = momentum / (1.0 + momentum)
        upd_re, upd_im = normalize(new_re - m * prev_re, new_im - m * prev_im)
        return upd_re, upd_im, new_re, new_im

    init = (jnp.ones_like(S), jnp.zeros_like(S),
            jnp.zeros_like(S), jnp.zeros_like(S))
    ang_re, ang_im, _, _ = jax.lax.fori_loop(0, n_iter, body, init)
    y = istft_padded(S * ang_re, S * ang_im)
    return y[n_fft // 2: out_len - n_fft // 2]


def _griffin_lim_general(S, n_iter, n_fft, hop_length, win_length, momentum):
    """Gather-based fallback for hop sizes that don't tile n_fft."""
    eps = 1e-16

    def normalize(re, im):
        mag = jnp.sqrt(re * re + im * im) + eps
        return re / mag, im / mag

    def body(_, carry):
        ang_re, ang_im, prev_re, prev_im = carry
        wav = spectral.istft(S * ang_re, S * ang_im, n_fft, hop_length,
                             win_length)
        new_re, new_im = spectral.stft(wav, n_fft, hop_length, win_length)
        m = momentum / (1.0 + momentum)
        upd_re, upd_im = normalize(new_re - m * prev_re, new_im - m * prev_im)
        return upd_re, upd_im, new_re, new_im

    init = (jnp.ones_like(S), jnp.zeros_like(S),
            jnp.zeros_like(S), jnp.zeros_like(S))
    ang_re, ang_im, _, _ = jax.lax.fori_loop(0, n_iter, body, init)
    return spectral.istft(S * ang_re, S * ang_im, n_fft, hop_length,
                          win_length)


def reconstruct_waveform_from_linear(S: jax.Array, n_iter: int, n_fft: int,
                                     hop_length: int, win_length: int) -> jax.Array:
    return griffin_lim(S, n_iter, n_fft, hop_length, win_length)
