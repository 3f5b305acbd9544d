"""Functional NN primitives over explicit parameter pytrees.

Design: every module is a lightweight Python object holding only *static*
configuration. ``init(key)`` returns a nested-dict parameter pytree;
``apply(params, ...)`` is a pure function of (params, inputs). jit/grad/pjit
are applied at the step-function level, never inside modules — so the whole
model is a single XLA computation with static shapes.

Initializers match the reference's Keras defaults (glorot-uniform kernels,
zero biases, uniform(-0.05, 0.05) embeddings, LayerNorm eps 1e-6) so that a
converted reference checkpoint drops into the same pytree slots.

Matmuls accumulate in float32 via ``preferred_element_type`` regardless of
the compute dtype. Matmul precision follows the operand dtype: float32
operands use ``Precision.HIGHEST`` (so float32 paths stay exactly float32 —
JAX's implicit TPU default would silently downcast them to bfloat16), while
bfloat16 operands use ``Precision.DEFAULT`` — a bf16×bf16 product is exactly
representable in the float32 accumulator, so one MXU pass is already exact
and HIGHEST would only force a ~3× slower multi-pass emulation (measured:
423k → 1.24M mel frames/s on the bench forward pass).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

PRECISION = jax.lax.Precision.HIGHEST

# How Conv1D lowers a SAME conv: 'lax' | 'shifted' | 'unfold' (see Conv1D).
CONV1D_FORMULATION = 'lax'


def matmul_precision(dtype) -> jax.lax.Precision:
    """HIGHEST for float32 operands (exactness); DEFAULT for bfloat16
    (single-pass MXU, already exact into the f32 accumulator)."""
    if dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _activation(name: Optional[str]):
    if name is None or name == 'linear':
        return lambda x: x
    if name == 'relu':
        return jax.nn.relu
    if name == 'tanh':
        return jnp.tanh
    if name == 'sigmoid':
        return jax.nn.sigmoid
    if name == 'gelu':
        return jax.nn.gelu
    raise ValueError(f'unknown activation: {name}')


def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], deterministic: bool) -> jax.Array:
    """Inverted dropout; identity when deterministic or rate == 0.

    The mask draws 16 random bits per element (``jax.random.bits`` uint16)
    instead of ``bernoulli``'s 32 (u32 bits -> f32 uniform -> compare):
    RngBitGenerator cannot fuse, so its output is real HBM traffic, and the
    training step is memory-bound — at B16x896f each (B,H,T,T)
    attention-weight mask costs 103 MB of u32 bits per generation (and the
    rematted backward generates twice). u16 halves that for a drop
    probability quantized to round(rate*2^16)/2^16 — off by at most 2^-17
    absolute, far below any measurable training effect (the keep-scale
    still uses the exact rate). Mask STREAM changes vs bernoulli (same
    class of change as round 3's threefry->rbg move); determinism per
    (seed, step) is unchanged.
    """
    if deterministic or rate == 0.0:
        return x
    if rate >= 1.0:
        # keep-scale would be x/0: a rate this pathological means "drop
        # everything", so return exact zeros instead of inf-tainted values
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    thresh = int(round(rate * 65536.0))
    if thresh == 0:
        return x
    bits = jax.random.bits(rng, x.shape, jnp.uint16)
    mask = bits >= jnp.uint16(thresh)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class Dense:
    """y = act(x @ kernel + bias). Kernel layout (in, out) = Keras layout."""

    def __init__(self, in_dim: int, out_dim: int, activation: Optional[str] = None,
                 use_bias: bool = True):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.act = _activation(activation)
        self.use_bias = use_bias

    def init(self, key) -> Params:
        p = {'kernel': _glorot_uniform(key, (self.in_dim, self.out_dim),
                                       self.in_dim, self.out_dim)}
        if self.use_bias:
            p['bias'] = jnp.zeros((self.out_dim,), jnp.float32)
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        # bf16 path: no preferred_element_type — the MXU still accumulates in
        # f32 internally, and a homogeneous dtype keeps the conv/dot vjp
        # well-typed (f32 cotangents against bf16 kernels are rejected)
        pet = jnp.float32 if x.dtype == jnp.float32 else None
        y = jnp.dot(x, params['kernel'].astype(x.dtype),
                    precision=matmul_precision(x.dtype),
                    preferred_element_type=pet)
        if self.use_bias:
            y = y + params['bias'].astype(y.dtype)
        return self.act(y).astype(x.dtype)


class Conv1D:
    """Time-wise 1D convolution over (batch, time, channels).

    Kernel layout (width, in, out) = Keras Conv1D layout for direct
    checkpoint conversion.

    ``CONV1D_FORMULATION`` selects how a SAME-padded conv lowers:

    - ``'lax'``: ``lax.conv_general_dilated`` NWC. The conv itself hits
      85–94% of bf16 peak in isolation (scripts/bench_conv_formulations.py),
      but in the full synthesis graph XLA assigns the conv operand layout
      {2,0,1} while every surrounding dot/LN/attention op uses {1,2,0} —
      costing three ~0.05–0.06 ms layout copies per conv block (~1.0 ms of
      the 21 ms B64×768f dispatch, measured round 5).
    - ``'shifted'``: k time-shifted ``dot_general``s summed. Same FLOPs on
      the MXU, but every operand is a plain dot in the ambient layout, so
      layout assignment has nothing to disagree about.
    - ``'unfold'``: concat the k shifts channel-wise into one GEMM.

    All three are mathematically identical (same f32 accumulation); the knob
    only changes the lowering. Default 'lax'.
    """

    def __init__(self, in_dim: int, filters: int, kernel_size: int,
                 padding: str = 'SAME', activation: Optional[str] = None):
        self.in_dim = in_dim
        self.filters = filters
        self.kernel_size = kernel_size
        self.padding = padding.upper()
        self.act = _activation(activation)

    def init(self, key) -> Params:
        fan_in = self.in_dim * self.kernel_size
        fan_out = self.filters * self.kernel_size
        return {
            'kernel': _glorot_uniform(key, (self.kernel_size, self.in_dim, self.filters),
                                      fan_in, fan_out),
            'bias': jnp.zeros((self.filters,), jnp.float32),
        }

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        pet = jnp.float32 if x.dtype == jnp.float32 else None
        kernel = params['kernel'].astype(x.dtype)
        prec = matmul_precision(x.dtype)
        form = CONV1D_FORMULATION
        if form != 'lax' and self.padding == 'SAME':
            k = self.kernel_size
            half = k // 2
            if form == 'shifted':
                # y[t] = sum_w x[t + w - half] @ kernel[w], zero-padded ends
                y = jnp.dot(x, kernel[half], precision=prec,
                            preferred_element_type=pet)
                for w in range(k):
                    if w == half:
                        continue
                    s = w - half
                    part = jnp.dot(x[:, max(s, 0): x.shape[1] + min(s, 0)],
                                   kernel[w], precision=prec,
                                   preferred_element_type=pet)
                    if s < 0:
                        y = y.at[:, -s:].add(part)
                    else:
                        y = y.at[:, :x.shape[1] - s].add(part)
            else:  # unfold
                b, t, c = x.shape
                shifts = []
                for w in range(k):
                    s = w - half
                    sl = x[:, max(s, 0): t + min(s, 0)]
                    pad = [(0, 0), (-min(s, 0), max(s, 0)), (0, 0)]
                    shifts.append(jnp.pad(sl, pad))
                xcat = jnp.concatenate(shifts, axis=-1)          # (B, T, kC)
                y = jnp.dot(xcat, kernel.reshape(k * c, -1),
                            precision=prec, preferred_element_type=pet)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=(1,),
                padding=self.padding,
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                precision=prec,
                preferred_element_type=pet)
        y = y + params['bias'].astype(y.dtype)
        return self.act(y).astype(x.dtype)


class LayerNorm:
    """LayerNorm over the last axis, eps matches the reference (1e-6)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        self.dim = dim
        self.eps = eps

    def init(self, key) -> Params:
        del key
        return {'gamma': jnp.ones((self.dim,), jnp.float32),
                'beta': jnp.zeros((self.dim,), jnp.float32)}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * params['gamma'] + params['beta']).astype(x.dtype)


class Embedding:
    """Token embedding table; row order is fixed by the tokenizer alphabet."""

    def __init__(self, vocab_size: int, dim: int):
        self.vocab_size = vocab_size
        self.dim = dim

    def init(self, key) -> Params:
        return {'table': jax.random.uniform(key, (self.vocab_size, self.dim),
                                            jnp.float32, -0.05, 0.05)}

    def apply(self, params: Params, ids: jax.Array) -> jax.Array:
        return jnp.take(params['table'], ids, axis=0)


def split_keys(key, n: int):
    return list(jax.random.split(key, n))


def init_submodules(key, named_modules: dict) -> Params:
    """Initialize a dict of {name: module} into {name: params}."""
    keys = split_keys(key, max(len(named_modules), 1))
    return {name: mod.init(k) for (name, mod), k in zip(named_modules.items(), keys)}
