"""Static-shape length regulator (the TPU-native replacement for the
reference's RaggedTensor ``Expand`` layer, model/layers.py:527-565).

The reference tiles each phoneme vector ``max_dur`` times and repacks through
a RaggedTensor — dynamic shapes that cannot compile on TPU. Here the same
semantics are computed with static shapes:

    ends[b, j]  = cumsum(round(durations))          # frame index where phoneme j ends
    idx[b, t]   = #{j : ends[b, j] <= t}            # phoneme owning frame t
    out[b, t]   = x[b, idx[b, t]] if t < total else 0

The comparison matrix is an O(T·N) VPU op; the gather is a single
``take_along_axis``. Frames at or beyond the total duration are zeroed so the
downstream mel padding mask (sum(|x|) == 0) sees them as padding, exactly like
the ragged ``to_tensor()`` zero-padding in the reference.

Output length is a static ``max_frames`` (chosen per bucket at trace time);
rounding matches tf.round (banker's rounding, same as jnp.round).
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def regulate_length(x: jax.Array, durations: jax.Array, max_frames: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Expand phoneme-level features to frame-level.

    Args:
        x: (B, N, D) phoneme-level features.
        durations: (B, N) float durations in frames (will be rounded).
        max_frames: static output length T.

    Returns:
        (out (B, T, D), frame_valid (B, T) float 1/0 mask).
    """
    dur = jnp.round(durations.astype(jnp.float32)).astype(jnp.int32)
    dur = jnp.maximum(dur, 0)
    ends = jnp.cumsum(dur, axis=1)                       # (B, N)
    total = ends[:, -1]                                   # (B,)
    t = jnp.arange(max_frames, dtype=jnp.int32)           # (T,)
    # phoneme index owning each frame: count of ends <= t
    idx = jnp.sum((t[None, :, None] >= ends[:, None, :]).astype(jnp.int32),
                  axis=-1)                                # (B, T)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = (t[None, :] < total[:, None]).astype(x.dtype)  # (B, T)
    return out * valid[:, :, None], valid
