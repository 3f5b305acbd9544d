"""Masked losses for TTS training.

Capability parity with the reference loss set (utils/losses.py:4-70):
masked MAE/MSE where the mask is derived from non-zero targets, a 3-class
stop-token crossentropy with the stop frame upweighted, and a weighted-sum
combiner. All are pure jnp functions that jit into the train step — no
host-side reduction.

Loss weights used by the models (for reference parity):
- Aligner: [mel 1.0, stop 1.0] (reference model/models.py:223)
- ForwardTransformer: [mel 1.0, duration 1.0, pitch 3.0]
  (reference model/models.py:485)
"""
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _nonzero_mask(targets: jax.Array) -> jax.Array:
    """Mask of frames/positions that contain any signal.

    Matches the reference convention (utils/losses.py:32-49): a target
    position counts as padding iff it is exactly zero in every channel.
    """
    if targets.ndim == 3:
        return (jnp.sum(jnp.abs(targets), axis=-1) > 0).astype(jnp.float32)
    return (jnp.abs(targets) > 0).astype(jnp.float32)


def masked_mean_absolute_error(targets: jax.Array, predictions: jax.Array,
                               mask: jax.Array = None) -> jax.Array:
    """MAE over non-padding positions. targets/predictions: (B, T, C) or (B, T)."""
    if mask is None:
        mask = _nonzero_mask(targets)
    err = jnp.abs(targets.astype(jnp.float32) - predictions.astype(jnp.float32))
    if err.ndim == 3:
        err = jnp.mean(err, axis=-1)
    total = jnp.sum(err * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def masked_mean_squared_error(targets: jax.Array, predictions: jax.Array,
                              mask: jax.Array = None) -> jax.Array:
    if mask is None:
        mask = _nonzero_mask(targets)
    err = jnp.square(targets.astype(jnp.float32) - predictions.astype(jnp.float32))
    if err.ndim == 3:
        err = jnp.mean(err, axis=-1)
    total = jnp.sum(err * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def masked_crossentropy(targets: jax.Array, logits: jax.Array) -> jax.Array:
    """Sparse CE where class 0 marks padding (reference utils/losses.py:24-29).

    targets: (B, T) int class ids; logits: (B, T, C).
    """
    mask = (targets > 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    total = jnp.sum(ce * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def new_scaled_crossentropy(index: int = 2, scaling: float = 1.0
                            ) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Stop-token CE with the stop class upweighted ×``scaling``.

    Returns a loss fn over (targets (B, T) ∈ {0: pad, 1: continue, 2: stop},
    logits (B, T, 3)). Padding (class 0) is masked out; positions whose target
    equals ``index`` contribute ``scaling``× their CE
    (reference utils/losses.py:4-21, stop_scaling=8 in training).
    """

    def loss_fn(targets: jax.Array, logits: jax.Array) -> jax.Array:
        targets = targets.astype(jnp.int32)
        mask = (targets > 0).astype(jnp.float32)
        weight = jnp.where(targets == index, jnp.float32(scaling), 1.0) * mask
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        total = jnp.sum(ce * weight)
        count = jnp.maximum(jnp.sum(mask), 1.0)
        return total / count

    return loss_fn


def weighted_sum_losses(targets: Sequence, predictions: Sequence,
                        loss_functions: Sequence[Callable],
                        coeffs: Sequence[float]
                        ) -> Tuple[jax.Array, List[jax.Array]]:
    """Combine per-output losses with static weights (utils/losses.py:63-69)."""
    losses = [fn(t, p) for fn, t, p in zip(loss_functions, targets, predictions)]
    total = sum(c * l for c, l in zip(coeffs, losses))
    return total, losses
