"""Training-state checkpointing.

Capability parity with the reference's two-tier scheme (SURVEY.md §5):
1. *training state* — (step, params, optimizer state) saved every N steps with
   a rolling ``latest`` plus keep-n retention; resume is "run the same
   command" (reference train_tts.py:121-131, train_aligner.py:110-123);
2. *distribution format* — the models' own ``save_model`` self-describing
   dirs (models/forward_tts.py, models/aligner.py).

Storage is a single ``.npz`` per checkpoint: the TrainState pytree is
flattened to indexed leaves and rebuilt against a template produced by
``tx.init(params)``, so any optax optimizer state round-trips without a
custom serializer. Atomic rename prevents torn files on preemption — the TPU
failure mode worth designing for (preemptible slices).
"""
import os
import re
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.training.state import TrainState

# fullmatch-anchored: '.tmp_ckpt_<n>.npz' (a torn write left by a crash
# mid-save) must NOT be picked up as the latest checkpoint
_CKPT_RE = re.compile(r'ckpt_(\d+)\.npz')


def _flatten_state(state: TrainState) -> dict:
    leaves = jax.tree_util.tree_leaves(state)
    return {f'leaf_{i:05d}': np.asarray(x) for i, x in enumerate(leaves)}


def _unflatten_state(template: TrainState, flat: dict) -> TrainState:
    treedef = jax.tree_util.tree_structure(template)
    n = treedef.num_leaves
    leaves = [jnp.asarray(flat[f'leaf_{i:05d}']) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def list_checkpoints(directory) -> list:
    directory = Path(directory)
    if not directory.exists():
        return []
    found = []
    for f in directory.iterdir():
        m = _CKPT_RE.fullmatch(f.name)
        if m:
            found.append((int(m.group(1)), f))
    return sorted(found)


def latest_checkpoint(directory) -> Optional[Path]:
    ckpts = list_checkpoints(directory)
    return ckpts[-1][1] if ckpts else None


def save_checkpoint(directory, state: TrainState, keep_n: int = None,
                    keep_every: int = None) -> Path:
    """Write ckpt_{step}.npz atomically; prune to ``keep_n`` newest, always
    retaining steps divisible by ``keep_every``."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = directory / f'ckpt_{step}.npz'
    tmp = directory / f'.tmp_ckpt_{step}.npz'
    # sweep torn writes left by a crash mid-save (they are never loaded —
    # list_checkpoints fullmatches — but should not accumulate)
    for stale in directory.glob('.tmp_ckpt_*.npz'):
        stale.unlink(missing_ok=True)
    # ONE batched device→host fetch first: np.savez fetches each leaf
    # separately otherwise, costing a network round trip per tensor on
    # remote-dispatch backends (scripts/measure_dispatch_breakdown.py)
    state_h = jax.device_get(state)
    with open(tmp, 'wb') as f:
        np.savez(f, **_flatten_state(state_h))
    os.replace(tmp, path)
    if keep_n is not None:
        ckpts = list_checkpoints(directory)
        prune = ckpts[:-keep_n] if keep_n > 0 else []
        for s, f in prune:
            if keep_every and s > 0 and s % keep_every == 0:
                continue
            f.unlink(missing_ok=True)
    return path


def restore_checkpoint(path, template: TrainState) -> TrainState:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten_state(template, flat)


def restore_latest(directory, template: TrainState) -> Optional[TrainState]:
    """Restore the newest checkpoint, or None if the directory is empty."""
    path = latest_checkpoint(directory)
    if path is None:
        return None
    return restore_checkpoint(path, template)
