"""Shared trainer scaffolding: state placement, step compilation, batch
sharding. Subclasses (ForwardTrainer, AlignerTrainer) define the loss and
the ``_train_step_impl`` / ``_val_step_impl`` bodies plus their static
argument positions.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformertts_tpu.parallel import mesh as mesh_lib
from transformertts_tpu.training.state import TrainState, init_state


def accumulate_grads(loss_and_grads, params, batch: dict, rng, n: int):
    """Split ``batch`` into ``n`` micro-batches, ``lax.scan`` fwd+bwd over
    them, and return (mean grads, stacked aux, full batch size).

    ``loss_and_grads(params, micro_batch, rng) -> (grads, aux)`` is the
    per-micro-batch body; the returned aux pytree leaves are stacked with a
    leading micro-step axis of length ``n`` (scalars become shape ``(n,)``,
    per-sample arrays ``(n, b/n, ...)``) — callers restack with
    :func:`restack_accumulated_aux`. Loss semantics are the standard
    grad-accumulation ones: the gradient is the mean of micro-batch
    gradients, which equals the full-batch gradient when every micro-batch
    has the same valid-element count (masked losses normalize per
    micro-batch).
    """
    b = next(iter(batch.values())).shape[0]
    if b % n != 0:
        raise ValueError(
            f'batch size {b} not divisible by grad_accumulation={n}')
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((n, b // n) + x.shape[1:]), batch)

    def body(acc, xs):
        i, mb = xs
        g, aux = loss_and_grads(params, mb, jax.random.fold_in(rng, i))
        acc = jax.tree_util.tree_map(jnp.add, acc, g)
        return acc, aux

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    acc, aux_st = jax.lax.scan(body, zeros, (jnp.arange(n), micro))
    grads = jax.tree_util.tree_map(lambda g: g / n, acc)
    return grads, aux_st, b


def restack_accumulated_aux(aux_st, b: int):
    """Undo the scan stacking: scalar leaves (stacked to ``(n,)``) become
    the mean over micro-steps; per-sample leaves ``(n, b/n, ...)`` are
    reshaped back to full-batch leading dim ``(b, ...)``."""
    return jax.tree_util.tree_map(
        lambda v: jnp.mean(v, axis=0) if v.ndim == 1
        else v.reshape((b,) + v.shape[2:]), aux_st)


class BaseTrainer:
    """Owns the optimizer, the mesh, and the compiled step functions."""

    # positions of static jit args in _train_step_impl/_val_step_impl
    # (after the leading state/batch pair)
    train_static_argnums: tuple = ()
    val_static_argnums: tuple = ()

    def __init__(self, model, tx: optax.GradientTransformation,
                 mesh: Optional[Mesh] = None, base_rng_seed: int = 42,
                 rng_impl: str = 'rbg'):
        self.model = model
        self.tx = tx
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        # Dropout keys use the 'rbg' generator: XLA's native RngBitGenerator
        # runs at HBM speed on TPU where the default threefry is ALU-bound
        # software — measured 11 ms/step (30%) of the published-scale train
        # step before, ~2 ms after (scripts/profile_train_step.py). Still
        # deterministic per (seed, step); pass rng_impl='threefry2x32' to
        # reproduce pre-switch mask streams bit-exactly.
        self.base_rng = jax.random.key(base_rng_seed, impl=rng_impl)
        self._train_step = None
        self._val_step = None

    # ------------------------------------------------------------------ state

    def state_shardings(self, state: TrainState):
        """Per-leaf NamedShardings: TP specs on wide kernels when the mesh
        has a model axis, replication otherwise. Optimizer moments mirror the
        parameter structure, so the same rule tree applies to them — then the
        Adam moments are additionally sharded over 'data' (ZeRO-1,
        :func:`mesh_lib.zero1_specs`): each device stores and updates 1/N of
        m/v, cutting the replicated 1.47 GB/step optimizer HBM traffic
        (BASELINE.md roofline) to 1/N per device at the cost of one
        parameter-update all-gather over ICI. Inert on a 1-device mesh."""
        specs = mesh_lib.tp_param_specs(state, self.mesh)
        specs = mesh_lib.zero1_specs(state, specs, self.mesh)
        return jax.tree_util.tree_map(
            lambda sp: NamedSharding(self.mesh, sp), specs,
            is_leaf=lambda x: isinstance(x, P))

    def init_state(self, key=None, params=None, step: int = 0) -> TrainState:
        if params is None:
            params = self.model.init_params(key if key is not None
                                            else jax.random.PRNGKey(0))
        state = init_state(params, self.tx, step)
        if self.mesh.devices.size == 1:  # trivial mesh: plain placement
            dev = self.mesh.devices.flat[0]
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev), state)
        return jax.tree_util.tree_map(
            jax.device_put, state, self.state_shardings(state))

    # ------------------------------------------------------------------ steps

    def _build_steps(self, state: TrainState):
        # Single-device mesh: plain jit. Explicit NamedSharding in_shardings
        # compile to an SPMD executable whose per-call overhead is ~3x the
        # step itself on remote-dispatch backends (measured 130 ms vs 43 ms
        # at the published scale) and buys nothing without a second device.
        if self.mesh.devices.size == 1:
            self._train_step = jax.jit(
                self._train_step_impl,
                static_argnums=self.train_static_argnums,
                donate_argnums=(0,))
            self._val_step = jax.jit(
                self._val_step_impl,
                static_argnums=self.val_static_argnums)
            return
        state_sh = self.state_shardings(state)
        data = NamedSharding(self.mesh, P(mesh_lib.DATA_AXIS))
        # static args are positional: pjit rejects kwargs when in_shardings
        # is given. out_shardings pins the returned state to the SAME layout
        # as the input state: without it GSPMD propagates the ZeRO-1 moment
        # sharding into the updated params (they come back reduce-scattered
        # over 'data' and the next call's in_shardings rejects them); pinning
        # them replicated makes XLA emit the ZeRO-1 update all-gather inside
        # the step. aux stays unconstrained.
        self._train_step = jax.jit(
            self._train_step_impl,
            static_argnums=self.train_static_argnums,
            in_shardings=(state_sh, data),
            out_shardings=(state_sh, None),
            donate_argnums=(0,))
        self._val_step = jax.jit(
            self._val_step_impl,
            static_argnums=self.val_static_argnums,
            in_shardings=(state_sh, data))

    def _train_step_impl(self, state: TrainState, batch: dict, *args):
        raise NotImplementedError

    def _val_step_impl(self, state: TrainState, batch: dict, *args):
        raise NotImplementedError

    # ------------------------------------------------------------------ API

    def shard_batch(self, batch: dict) -> dict:
        # numeric fields only: bookkeeping entries like fname stay on host
        batch = {k: v for k, v in batch.items()
                 if not (hasattr(v, 'dtype') and v.dtype.kind in 'US')}
        batch = mesh_lib.pad_batch_to_multiple(
            batch, self.mesh.shape[mesh_lib.DATA_AXIS])
        return mesh_lib.shard_batch(self.mesh, batch)
