"""Sinusoidal positional encodings (reference: model/transformer_utils.py:5-21)."""
import numpy as np


def positional_encoding(max_position: int, model_dim: int) -> np.ndarray:
    """(1, max_position, model_dim) float32, sin on even dims, cos on odd.

    Returns a HOST numpy array on purpose: the table is closed over by
    jitted functions, and a numpy constant embeds into the lowered IR
    directly. A device (jnp) constant would live on the default backend and
    be fetched back at every first lowering — through a remote-dispatch
    TPU tunnel that fetch measured 40-400 s per process.
    """
    pos = np.arange(max_position)[:, None].astype(np.float64)
    i = np.arange(model_dim)[None, :]
    angle_rates = 1.0 / np.power(10000.0, (2 * (i // 2)) / np.float64(model_dim))
    angles = pos * angle_rates
    angles[:, 0::2] = np.sin(angles[:, 0::2])
    angles[:, 1::2] = np.cos(angles[:, 1::2])
    return np.asarray(angles[None, ...], dtype=np.float32)
