"""Training schedules.

Capability parity with the reference (utils/scheduling.py:31-47):
- ``piecewise_linear_schedule``: LR interpolation over (step, value) knots.
  Implemented as a pure jnp function of the step so it lives *inside* the
  jitted train step (the reference computes it host-side with numpy and
  assigns to the optimizer each step).
- ``reduction_schedule``: step function for the Aligner reduction factor r.
  r changes select a different compiled executable, so this one is evaluated
  on host (it is a Python int by design).
"""
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def piecewise_linear_schedule(step, schedule: Sequence[Tuple[float, float]]):
    """Linear interpolation through (step, value) knots; clamped at the ends.

    Works on traced jnp steps (inside jit) and host ints alike.
    """
    sched = np.asarray(schedule, dtype=np.float32)
    xs, ys = sched[:, 0], sched[:, 1]
    return jnp.interp(jnp.asarray(step, jnp.float32), jnp.asarray(xs), jnp.asarray(ys))


def reduction_schedule(step: int, schedule: Sequence[Tuple[int, int]]) -> int:
    """Piecewise-constant reduction factor: the value of the last knot whose
    step is <= ``step`` (reference utils/scheduling.py:39-46). Host-side: r is
    a static compile-time constant selecting the executable.
    """
    sched = sorted((int(s), int(v)) for s, v in schedule)
    value = sched[0][1]
    for s, v in sched:
        if step >= s:
            value = v
    return int(value)


def linear_function(x, x0, x1, y0, y1):
    """y at x on the line through (x0, y0), (x1, y1)."""
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)
