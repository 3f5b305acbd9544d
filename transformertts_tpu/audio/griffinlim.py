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
                  f_min: float, f_max: float) -> jax.Array:
    """Amplitude mel (T, n_mels) → linear magnitude (T, 1 + n_fft//2)."""
    pinv = jnp.asarray(mel_pinv(sampling_rate, n_fft, amp_mel.shape[-1],
                                f_min, f_max), dtype=amp_mel.dtype)
    S = jnp.matmul(amp_mel, pinv, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(S, 0.0)


@partial(jax.jit, static_argnames=('n_iter', 'n_fft', 'hop_length',
                                   'win_length', 'momentum'))
def griffin_lim(S: jax.Array, n_iter: int, n_fft: int, hop_length: int,
                win_length: int, momentum: float = 0.99) -> jax.Array:
    """Phase reconstruction from magnitude STFT S (n_frames, n_bins) → wav."""
    S = S.astype(jnp.float32)
    eps = 1e-16

    def normalize(re, im):
        mag = jnp.sqrt(re * re + im * im) + eps
        return re / mag, im / mag

    # zero-phase init: angles = 1 + 0j
    ang_re = jnp.ones_like(S)
    ang_im = jnp.zeros_like(S)
    reb_re = jnp.zeros_like(S)
    reb_im = jnp.zeros_like(S)

    def body(_, carry):
        ang_re, ang_im, prev_re, prev_im = carry
        wav = spectral.istft(S * ang_re, S * ang_im, n_fft, hop_length, win_length)
        new_re, new_im = spectral.stft(wav, n_fft, hop_length, win_length)
        m = momentum / (1.0 + momentum)
        upd_re = new_re - m * prev_re
        upd_im = new_im - m * prev_im
        upd_re, upd_im = normalize(upd_re, upd_im)
        return upd_re, upd_im, new_re, new_im

    ang_re, ang_im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ang_re, ang_im, reb_re, reb_im))
    return spectral.istft(S * ang_re, S * ang_im, n_fft, hop_length, win_length)


def reconstruct_waveform_from_linear(S: jax.Array, n_iter: int, n_fft: int,
                                     hop_length: int, win_length: int) -> jax.Array:
    return griffin_lim(S, n_iter, n_fft, hop_length, win_length)
