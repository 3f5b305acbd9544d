"""Training state + optimizer.

The reference compiles models with Adam(β1 .9, β2 .98, ε 1e-9) and assigns a
host-computed piecewise-linear LR to the optimizer every step
(utils/training_config_manager.py:102-110, model/models.py:552-557). Here the
schedule is a pure function of the on-device step inside the jitted update —
no host round-trip, no retrace.
"""
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from transformertts_tpu.utils.scheduling import piecewise_linear_schedule


class TrainState(NamedTuple):
    step: jax.Array          # () int32
    params: Any              # nested-dict pytree
    opt_state: Any


def make_optimizer(learning_rate_schedule: Sequence[Tuple[float, float]],
                   beta_1: float = 0.9, beta_2: float = 0.98,
                   eps: float = 1e-9,
                   global_clip_norm: float = None) -> optax.GradientTransformation:
    """Adam with a piecewise-linear LR evaluated on device per step."""
    def lr(step):
        return piecewise_linear_schedule(step, learning_rate_schedule)
    tx = optax.adam(learning_rate=lr, b1=beta_1, b2=beta_2, eps=eps)
    if global_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(global_clip_norm), tx)
    return tx


def init_state(params, tx: optax.GradientTransformation, step: int = 0) -> TrainState:
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      opt_state=tx.init(params))
