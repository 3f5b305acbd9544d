"""Small tensor helpers (reference: utils/vec_ops.py)."""
import jax.numpy as jnp


def norm_tensor(tensor):
    """Min-max normalize to [0, 1] (used for display images)."""
    t_min = jnp.min(tensor)
    t_max = jnp.max(tensor)
    return (tensor - t_min) / jnp.maximum(t_max - t_min, 1e-12)
