"""Length helpers from padding (reference: utils/spectrogram_ops.py:8-17)."""
import jax.numpy as jnp


def mel_lengths(mel_batch, padding_value: float = 0.0):
    """(B, T, C) → (B,) count of frames that are not all-``padding_value``."""
    not_pad = jnp.any(mel_batch != padding_value, axis=-1)
    return jnp.sum(not_pad.astype(jnp.int32), axis=-1)


def phoneme_lengths(phonemes, phoneme_padding: int = 0):
    """(B, N) → (B,) count of non-padding token ids."""
    return jnp.sum((phonemes != phoneme_padding).astype(jnp.int32), axis=-1)
