"""Spectral DSP primitives: STFT, mel filterbank, ISTFT.

The reference delegates to librosa 0.7.1 (data/audio.py:72-110). Since the
model's training targets are log-mel features, the conventions here replicate
librosa's exactly so that features (and checkpoints trained on them) transfer:

- STFT: center-padded by ``n_fft // 2`` with reflect padding, periodic Hann
  window (``scipy.signal.get_window('hann', n, fftbins=True)``).
- mel filterbank: Slaney mel scale (linear below 1 kHz, log above) with
  Slaney area normalization — librosa ``htk=False, norm='slaney'``.
- ISTFT: windowed overlap-add normalized by the squared-window envelope.

Every primitive has a NumPy implementation (host-side preprocessing /
golden values) and a jnp implementation (device). The jnp STFT is expressed
as gather-framing + matmul against precomputed DFT bases — the GEMM-native
NDFT formulation — so XLA maps it onto the MXU; ``ops/stft_pallas.py`` fuses
the same computation further (framing + window + DFT + mel + log in one
kernel).
"""
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# windows and filterbanks (host precompute, cached)
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches scipy get_window('hann', n, fftbins=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=8)
def mel_filterbank(sampling_rate: int, n_fft: int, n_mels: int,
                   f_min: float, f_max: float) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-normalized triangular mel filterbank."""
    if f_max is None:
        f_max = sampling_rate / 2.0
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_min = _hz_to_mel_slaney(f_min)
    mel_max = _hz_to_mel_slaney(f_max)
    mel_pts = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float64)


@lru_cache(maxsize=8)
def dft_basis(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: (cos, -sin), each (n_fft, 1 + n_fft//2).

    ``frames @ cos_basis`` and ``frames @ sin_basis`` give Re/Im of the
    one-sided DFT of windowed frames — two GEMMs instead of an FFT, which is
    the MXU-friendly formulation for n_fft ~1k.
    """
    window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    angles = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(angles) * window[:, None])
    sin_b = (-np.sin(angles) * window[:, None])
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# NumPy reference implementations (host)
# ---------------------------------------------------------------------------


def frame_signal_np(y: np.ndarray, n_fft: int, hop_length: int,
                    center: bool = True, pad_mode: str = 'reflect') -> np.ndarray:
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    return y[idx]


def stft_np(y: np.ndarray, n_fft: int, hop_length: int, win_length: int,
            center: bool = True, pad_mode: str = 'reflect') -> np.ndarray:
    """Complex STFT, shape (n_frames, 1 + n_fft//2). librosa returns the
    transpose of this; orientation here is time-major throughout the
    framework."""
    window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    frames = frame_signal_np(np.asarray(y, dtype=np.float64), n_fft, hop_length,
                             center, pad_mode)
    return np.fft.rfft(frames * window[None, :], n=n_fft, axis=-1)


def mel_spectrogram_np(y: np.ndarray, sampling_rate: int, n_fft: int,
                       hop_length: int, win_length: int, n_mels: int,
                       f_min: float, f_max: float) -> np.ndarray:
    """Magnitude-mel (power=1), shape (n_frames, n_mels) — un-normalized."""
    D = stft_np(y, n_fft, hop_length, win_length)
    S = np.abs(D)
    fb = mel_filterbank(sampling_rate, n_fft, n_mels, f_min, f_max)
    return S @ fb.T


def istft_np(D: np.ndarray, n_fft: int, hop_length: int, win_length: int,
             center: bool = True, length: int = None) -> np.ndarray:
    """Inverse STFT by normalized windowed overlap-add.

    D: complex (n_frames, 1 + n_fft//2).
    """
    window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    frames = np.fft.irfft(D, n=n_fft, axis=-1) * window[None, :]
    n_frames = frames.shape[0]
    out_len = n_fft + hop_length * (n_frames - 1)
    y = np.zeros(out_len)
    win_sq = np.zeros(out_len)
    wsq = window ** 2
    for t in range(n_frames):
        start = t * hop_length
        y[start:start + n_fft] += frames[t]
        win_sq[start:start + n_fft] += wsq
    y = y / np.maximum(win_sq, 1e-10)
    if center:
        y = y[n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y


# ---------------------------------------------------------------------------
# jnp implementations (device; static shapes, GEMM-native DFT)
# ---------------------------------------------------------------------------


def frame_signal(y: jax.Array, n_fft: int, hop_length: int,
                 center: bool = True) -> jax.Array:
    """(..., T) → (..., n_frames, n_fft) frames with reflect center padding."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode='reflect')
    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = jnp.arange(n_fft)[None, :] + hop_length * jnp.arange(n_frames)[:, None]
    return jnp.take(y, idx, axis=-1)


def stft(y: jax.Array, n_fft: int, hop_length: int, win_length: int,
         center: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Real/imag STFT via two GEMMs: (..., n_frames, 1 + n_fft//2) each."""
    cos_b, sin_b = dft_basis(n_fft, win_length)
    frames = frame_signal(y, n_fft, hop_length, center)
    cos_b = jnp.asarray(cos_b, dtype=frames.dtype)
    sin_b = jnp.asarray(sin_b, dtype=frames.dtype)
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    return re, im


def stft_magnitude(y: jax.Array, n_fft: int, hop_length: int,
                   win_length: int, center: bool = True) -> jax.Array:
    re, im = stft(y, n_fft, hop_length, win_length, center)
    return jnp.sqrt(re * re + im * im + 1e-30)


def mel_spectrogram(y: jax.Array, sampling_rate: int, n_fft: int,
                    hop_length: int, win_length: int, n_mels: int,
                    f_min: float, f_max: float, center: bool = True) -> jax.Array:
    """Magnitude-mel (power=1): (..., n_frames, n_mels) — un-normalized."""
    S = stft_magnitude(y, n_fft, hop_length, win_length, center)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, f_min, f_max).T,
                     dtype=S.dtype)
    return jnp.matmul(S, fb, precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=8)
def _idft_basis(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse one-sided DFT as GEMM bases, window applied for overlap-add.

    irfft(X)[n] = (1/N) * sum_k w_k * (Re X_k cos(2πkn/N) - Im X_k sin(2πkn/N))
    with w_0 = w_{N/2} = 1 and w_k = 2 otherwise.
    """
    window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    k = np.arange(1 + n_fft // 2)[:, None]
    n = np.arange(n_fft)[None, :]
    angles = 2.0 * np.pi * k * n / n_fft
    w = np.full((1 + n_fft // 2, 1), 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    re_b = (w * np.cos(angles)) / n_fft * window[None, :]
    im_b = (-w * np.sin(angles)) / n_fft * window[None, :]
    return re_b, im_b


def istft(re: jax.Array, im: jax.Array, n_fft: int, hop_length: int,
          win_length: int, center: bool = True, length: int = None) -> jax.Array:
    """Inverse STFT (jnp): GEMM inverse-DFT + scatter-add overlap-add.

    re/im: (n_frames, 1 + n_fft//2). Returns (T,).
    """
    re_b, im_b = _idft_basis(n_fft, win_length)
    frames = (jnp.matmul(re, jnp.asarray(re_b, re.dtype),
                         precision=jax.lax.Precision.HIGHEST)
              + jnp.matmul(im, jnp.asarray(im_b, im.dtype),
                           precision=jax.lax.Precision.HIGHEST))
    n_frames = frames.shape[0]
    out_len = n_fft + hop_length * (n_frames - 1)
    window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    wsq_np = window ** 2
    if n_fft % hop_length == 0:
        # overlap-add without scatters: split each frame into n_fft/hop
        # hop-sized strips; strip k, flattened over frames, lands at offset
        # k·hop. K pad-and-add ops compile and run far faster than a scatter
        # (the scatter formulation took minutes to compile via remote Mosaic).
        k_strips = n_fft // hop_length
        y = jnp.zeros((out_len,), frames.dtype)
        for k in range(k_strips):
            strip = frames[:, k * hop_length:(k + 1) * hop_length].reshape(-1)
            y = y.at[k * hop_length:k * hop_length + strip.shape[0]].add(strip)
        # squared-window envelope is periodic in the interior: precompute on
        # host with the same strip decomposition
        wsq_host = np.zeros(out_len)
        for k in range(k_strips):
            strip = np.tile(wsq_np[k * hop_length:(k + 1) * hop_length],
                            n_frames)
            wsq_host[k * hop_length:k * hop_length + strip.shape[0]] += strip
        wsq = jnp.asarray(wsq_host, frames.dtype)
    else:
        idx = (jnp.arange(n_fft)[None, :]
               + hop_length * jnp.arange(n_frames)[:, None])
        y = jnp.zeros((out_len,), frames.dtype).at[idx].add(frames)
        wsq = jnp.zeros((out_len,), frames.dtype).at[idx].add(
            jnp.broadcast_to(jnp.asarray(wsq_np, frames.dtype),
                             (n_frames, n_fft)))
    y = y / jnp.maximum(wsq, 1e-10)
    if center:
        y = y[n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y
