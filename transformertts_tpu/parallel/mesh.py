"""Device mesh + sharding: the framework's distributed "communication backend".

The reference has no distributed runtime at all (SURVEY.md §2c — no
tf.distribute, no NCCL/MPI; single-device training loops in
train_tts.py:100-157). On TPU the equivalent capability is expressed as
sharding annotations over a `jax.sharding.Mesh`: jit partitions the step
function SPMD-style and XLA inserts the all-reduces over ICI. This module
centralizes every mesh/sharding decision so that models and training loops
never mention devices explicitly.

Design:
- mesh axes ``('data', 'model')``. Gradients ride ICI via the all-reduce XLA
  emits for the sharded batch axis; parameters and optimizer state are
  replicated over 'data' and (optionally) sharded over 'model'.
- At these model sizes (24M–40M params) data parallelism is the only
  parallelism the workload needs; the 'model' axis exists so that larger
  configs can shard the big matmuls (attention-conv filters of 1536) without
  any retooling.
- Batches are placed with ``jax.device_put`` + NamedSharding before the step,
  so host→device transfer happens once per step per host.
"""
import warnings
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f'mesh {data}x{model} does not tile {n} devices')
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, spec_tail: int = 0) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; trailing axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * spec_tail)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding.

    Multi-host: each process passes its *local* batch slice and the global
    array is assembled across processes (the TPU-native analogue of a
    per-rank DataLoader + NCCL all-gather-free input pipeline).
    """
    if mesh.devices.size == 1 and jax.process_count() == 1:
        # trivial mesh: plain device transfer — a NamedSharding placement
        # would re-trigger SPMD lowering in the (plain-jit) step functions.
        # Arrays already on the device pass through: device_put is NOT a
        # no-op for committed arrays on remote-dispatch backends (it round
        # trips, ~190 ms/call measured on a 5 MB batch).
        dev = mesh.devices.flat[0]

        def place(x):
            if isinstance(x, jax.Array) and dev in x.devices():
                return x
            return jax.device_put(x, dev)
        return jax.tree_util.tree_map(place, batch)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)

    def place_sharded(x):
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(place_sharded, batch)


def maybe_initialize_distributed(config: dict) -> None:
    """``jax.distributed.initialize()`` gated by the ``multihost`` config key.

    Safe to call more than once and outside multi-host launches; coordinator
    address/process ids come from the standard JAX env vars or the TPU
    metadata server.
    """
    if not config.get('multihost', False):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if 'already' not in str(e).lower():
            raise


def shard_params(mesh: Mesh, params):
    """Replicate a parameter/optimizer pytree across the mesh.

    Arrays already carrying the target sharding pass through untouched —
    device_put is not a no-op on remote-dispatch backends."""
    sharding = replicated(mesh)

    def place(x):
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(place, params)


# Megatron-style tensor-parallel pairs, keyed by parameter PATH (the model's
# own module names), not by tensor shape. Each pair is (column-parallel
# module, row-parallel module): the first GEMM's output dim shards over the
# 'model' axis, the second GEMM's input dim shards, and XLA inserts one
# all-reduce after the pair. These are the only wide hidden dims in the
# model family — the attention-conv filters (1536 at the published TTS
# scale, nn/blocks.py CNNResNorm inside Self/CrossAttentionConvBlock) and
# the FFN hidden (nn/blocks.py FFNResNorm).
TP_COLUMN_MODULES = ('conv/conv_0', 'ffn/d1')
TP_ROW_MODULES = ('conv/conv_1', 'ffn/d2')


def tp_param_specs(params, mesh: Mesh,
                   column_modules=TP_COLUMN_MODULES,
                   row_modules=TP_ROW_MODULES):
    """Tensor-parallel PartitionSpecs for a parameter pytree.

    Rule-table based: a kernel shards iff its module path ends with a name
    in ``column_modules`` (output dim over 'model', bias likewise) or
    ``row_modules`` (input dim over 'model', bias replicated — the partial
    sums all-reduce before the bias adds). Paths are matched, never shapes,
    so same-shaped unrelated tensors can never be sharded by accident; a
    matched dim that does not divide the model axis stays replicated (with
    a warning) rather than failing. Pass custom module lists to extend the
    table for new layer types.
    """
    model_size = mesh.shape[MODEL_AXIS]
    if model_size <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def leaf_spec(path, leaf):
        names = [str(getattr(p, 'key', getattr(p, 'name', ''))) for p in path]
        leaf_name = names[-1] if names else ''
        module = '/'.join(names[:-1])
        shape = getattr(leaf, 'shape', ())
        is_col = module.endswith(column_modules)
        is_row = module.endswith(row_modules)
        if not (is_col or is_row):
            return P()
        if leaf_name == 'kernel' and len(shape) >= 2:
            dim = shape[-1] if is_col else shape[-2]
            if dim % model_size != 0:
                warnings.warn(
                    f'TP: {module}/kernel dim {dim} does not divide model '
                    f'axis {model_size}; replicating')
                return P()
            if is_col:
                return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
            return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
        if leaf_name == 'bias' and is_col and len(shape) == 1 \
                and shape[0] % model_size == 0:
            return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def zero1_specs(state, specs, mesh: Mesh, moment_names=('mu', 'nu')):
    """ZeRO-1: upgrade optimizer-moment PartitionSpecs to shard over 'data'.

    The Adam update reads+writes f32 m/v/p for every parameter — 1.47 GB of
    HBM traffic per step at the published TTS scale (BASELINE.md roofline),
    fully replicated across data-parallel devices. Sharding the *moments*
    over the 'data' axis makes each device update 1/N of them (XLA turns the
    gradient all-reduce into reduce-scatter + all-gather of the parameter
    updates — ICI traffic, not HBM), the standard ZeRO-1 layout expressed
    purely as sharding annotations. Semantics are bit-identical to the
    replicated layout (tests/test_parallel.py).

    ``state``/``specs`` are matching pytrees (a TrainState and its
    PartitionSpec tree). Only leaves whose path crosses an attribute named in
    ``moment_names`` (optax's ScaleByAdamState fields) are touched: the FIRST
    axis that (a) is not already sharded by a TP rule and (b) divides the
    data-axis size gets the 'data' name; non-divisible leaves stay as given
    (they are the small ones). Parameters themselves stay replicated — at
    this model family's sizes the fwd/bwd wants zero extra collectives.
    """
    data = mesh.shape[DATA_AXIS]
    if data <= 1:
        return specs

    def upgrade(path, leaf, spec):
        names = {str(getattr(p, 'name', '')) for p in path}
        if not names & set(moment_names):
            return spec
        shape = getattr(leaf, 'shape', ())
        if not shape:
            return spec
        parts = list(spec) + [None] * (len(shape) - len(spec))
        for i, dim in enumerate(shape):
            if parts[i] is None and dim % data == 0 and dim >= data:
                parts[i] = DATA_AXIS
                return P(*parts)
        return spec

    return jax.tree_util.tree_map_with_path(
        upgrade, state, specs, is_leaf=lambda x: isinstance(x, P))


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the 'data' axis size.

    Padding samples are all-zero, which every masked loss in
    transformertts_tpu.utils.losses treats as fully padded — they contribute
    zero to every loss term, so gradients are unchanged up to the 1/count
    normalization (identical to how the reference averages over real frames).
    """
    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            # NOTE: do not np.asarray here — on device-resident arrays that
            # is a synchronous device→host fetch of the whole batch (tens of
            # ms to seconds through a remote-dispatch tunnel) for a no-op.
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)
    return {k: pad(v) for k, v in batch.items()}
