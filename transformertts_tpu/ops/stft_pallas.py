"""Fused mel-spectrogram frontend kernel (Pallas TPU).

The reference computes features on host via librosa (data/audio.py:72-92):
frame → window → FFT → |·| → mel filterbank → log. The XLA path in
audio/spectral.py already turns the DFT into GEMMs but materializes the
framed signal in HBM — 4× redundant at hop 256 — plus the complex spectrum
and magnitude. This kernel fuses framing + windowed DFT + magnitude + mel
projection + log compression, so those intermediates live only in VMEM.

Layout:
- the wav is pre-cut (by XLA) into overlapping *chunks* of TILE_F frames:
  chunk length = (TILE_F−1)·hop + n_fft, stride = TILE_F·hop. At TILE_F=64
  the chunk overlap is ~6% — the only duplicated HBM bytes (vs 300% for
  full framing).
- grid = (B, F/TILE_F); each program takes one chunk as a (1, 1, chunk_len)
  VMEM block, expands it to the (TILE_F, n_fft) frame matrix with hop-strided
  in-VMEM slices (hop is 128-lane aligned), then runs three MXU GEMMs
  (cos-DFT, sin-DFT, mel projection) with magnitude and log fused between
  them on the VPU.
- the windowed DFT bases (n_fft × bins) and transposed mel filterbank stay
  resident in VMEM (≈4.5 MB at n_fft 1024).

Numerics match audio/spectral.py's jnp path (which matches librosa) up to
float32 GEMM rounding; the caller pre-pads the wav for centering (reflect
n_fft//2 — the same contract as ``mel_spectrogram(center=False)``).
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from transformertts_tpu.audio.spectral import dft_basis, mel_filterbank


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(chunk_ref, cos_ref, sin_ref, mel_ref, out_ref, *,
            tile_f, hop, n_fft, clip_min):
    frames = jnp.stack(
        [chunk_ref[0, 0, pl.ds(f * hop, n_fft)] for f in range(tile_f)],
        axis=0).astype(jnp.float32)
    re = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.dot(mag, mel_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.clip(mel, clip_min, None))


@lru_cache(maxsize=4)
def _bases(sampling_rate, n_fft, win_length, n_mels, f_min, f_max):
    cos_b, sin_b = dft_basis(n_fft, win_length)
    fb = mel_filterbank(sampling_rate, n_fft, n_mels, f_min, f_max)
    bins = cos_b.shape[1]
    bins_pad = _round_up(bins, 128)
    mels_pad = _round_up(n_mels, 128)
    cos_p = np.zeros((n_fft, bins_pad), np.float32)
    cos_p[:, :bins] = cos_b
    sin_p = np.zeros((n_fft, bins_pad), np.float32)
    sin_p[:, :bins] = sin_b
    fb_p = np.zeros((bins_pad, mels_pad), np.float32)
    fb_p[:bins, :n_mels] = fb.T
    return cos_p, sin_p, fb_p


def fused_log_mel(wav_centered: jax.Array, sampling_rate: int, n_fft: int,
                  hop_length: int, win_length: int, n_mels: int,
                  f_min: float, f_max: float, clip_min: float = 1e-5,
                  tile_f: int = 64, interpret: bool = None) -> jax.Array:
    """(B, T) center-pre-padded wav → (B, F, n_mels) MelGAN log-mel.

    F = 1 + (T − n_fft) // hop_length. Caller applies reflect padding of
    n_fft//2 (see create_training_data.featurize_batch — identical contract).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _fused_log_mel(wav_centered, sampling_rate, n_fft, hop_length,
                          win_length, n_mels, f_min, f_max, clip_min,
                          tile_f, interpret)


@partial(jax.jit, static_argnums=tuple(range(1, 11)))
def _fused_log_mel(wav, sampling_rate, n_fft, hop_length, win_length,
                   n_mels, f_min, f_max, clip_min, tile_f, interpret):
    b, t = wav.shape
    n_frames = 1 + (t - n_fft) // hop_length
    f_pad = _round_up(n_frames, tile_f)
    n_chunks = f_pad // tile_f
    mels_pad = _round_up(n_mels, 128)
    chunk_len = _round_up((tile_f - 1) * hop_length + n_fft, 128)
    stride = tile_f * hop_length
    t_need = (n_chunks - 1) * stride + chunk_len
    wav_p = jnp.zeros((b, max(t, t_need)), jnp.float32).at[:, :t].set(
        wav.astype(jnp.float32))

    # overlapping chunks via XLA gather: (B, n_chunks, chunk_len); ~6%
    # duplication — the 4x-redundant frame matrix exists only in VMEM
    idx = (jnp.arange(n_chunks)[:, None] * stride
           + jnp.arange(chunk_len)[None, :])
    # (B·n_chunks, 1, chunk_len): middle singleton keeps the block's trailing
    # dims equal to the array dims (Mosaic tiling rule)
    chunks = wav_p[:, idx].reshape(b * n_chunks, 1, chunk_len)

    cos_p, sin_p, fb_p = _bases(sampling_rate, n_fft, win_length, n_mels,
                                f_min, f_max)
    grid = (b * n_chunks,)
    out = pl.pallas_call(
        partial(_kernel, tile_f=tile_f, hop=hop_length, n_fft=n_fft,
                clip_min=clip_min),
        out_shape=jax.ShapeDtypeStruct((b * n_chunks, tile_f, mels_pad),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, chunk_len), lambda i: (i, 0, 0)),
            pl.BlockSpec(cos_p.shape, lambda i: (0, 0)),
            pl.BlockSpec(sin_p.shape, lambda i: (0, 0)),
            pl.BlockSpec(fb_p.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_f, mels_pad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(chunks, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))
    out = out.reshape(b, f_pad, mels_pad)
    return out[:, :n_frames, :n_mels]
