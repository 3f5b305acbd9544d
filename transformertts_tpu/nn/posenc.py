"""Sinusoidal positional encodings (reference: model/transformer_utils.py:5-21)."""
import numpy as np
import jax.numpy as jnp


def positional_encoding(max_position: int, model_dim: int) -> jnp.ndarray:
    """(1, max_position, model_dim) float32, sin on even dims, cos on odd."""
    pos = np.arange(max_position)[:, None].astype(np.float64)
    i = np.arange(model_dim)[None, :]
    angle_rates = 1.0 / np.power(10000.0, (2 * (i // 2)) / np.float64(model_dim))
    angles = pos * angle_rates
    angles[:, 0::2] = np.sin(angles[:, 0::2])
    angles[:, 1::2] = np.cos(angles[:, 1::2])
    return jnp.asarray(angles[None, ...], dtype=jnp.float32)
