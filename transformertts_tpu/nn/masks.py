"""Mask construction.

Convention matches the reference (model/transformer_utils.py:24-37):
masks are float tensors where **1 = masked**, applied additively to attention
logits as ``logits + mask * -1e9``. Shapes broadcast to
(batch, heads, q_len, k_len).
"""
import jax.numpy as jnp


def encoder_padding_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """Token id 0 is padding. (B, T) int → (B, 1, 1, T) float."""
    mask = (seq == 0).astype(jnp.float32)
    return mask[:, None, None, :]


def mel_padding_mask(mel: jnp.ndarray) -> jnp.ndarray:
    """All-zero mel frames are padding. (B, T, C) → (B, 1, 1, T) float."""
    mask = (jnp.sum(jnp.abs(mel), axis=-1) == 0).astype(jnp.float32)
    return mask[:, None, None, :]


def look_ahead_mask(size: int) -> jnp.ndarray:
    """Causal mask: (size, size), upper triangle = 1 (masked)."""
    return 1.0 - jnp.tril(jnp.ones((size, size), jnp.float32))
