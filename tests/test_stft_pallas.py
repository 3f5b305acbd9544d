"""Fused Pallas mel frontend vs the jnp/librosa-parity reference."""
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.audio import spectral
from transformertts_tpu.ops.stft_pallas import fused_log_mel

SR, N_FFT, HOP, WIN, MELS = 22050, 512, 128, 512, 20


def test_fused_matches_reference_path():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(SR // 2).astype(np.float32) * 0.3
    centered = np.pad(wav, N_FFT // 2, mode='reflect')[None, :]
    ref = spectral.mel_spectrogram(
        jnp.asarray(centered), SR, N_FFT, HOP, WIN, MELS, 0, 8000,
        center=False)
    ref = np.log(np.clip(np.asarray(ref), 1e-5, None))
    out = np.asarray(fused_log_mel(jnp.asarray(centered), SR, N_FFT, HOP,
                                   WIN, MELS, 0, 8000, tile_f=16,
                                   interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_fused_batched():
    rng = np.random.default_rng(1)
    wavs = rng.standard_normal((3, SR // 4)).astype(np.float32)
    centered = np.pad(wavs, ((0, 0), (N_FFT // 2, N_FFT // 2)),
                      mode='reflect')
    out = np.asarray(fused_log_mel(jnp.asarray(centered), SR, N_FFT, HOP,
                                   WIN, MELS, 0, 8000, tile_f=16,
                                   interpret=True))
    ref = spectral.mel_spectrogram(jnp.asarray(centered), SR, N_FFT, HOP,
                                   WIN, MELS, 0, 8000, center=False)
    ref = np.log(np.clip(np.asarray(ref), 1e-5, None))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
