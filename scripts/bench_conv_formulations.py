"""Microbenchmark: is lax.conv the fastest k=3 SAME conv1d on TPU, or does
a GEMM formulation beat it?

The training-step profile shows conv fusions dominating device time at
~50-60%% of the matmul roofline, so the conv lowering itself is the prime
suspect. Three mathematically identical formulations at the published
attention-conv shape (384→1536→384, k=3, bf16):

  conv    — jax.lax.conv_general_dilated NWC (current nn/core.Conv1D)
  shifted — three dot_generals on time-shifted x, summed
  unfold  — concat the three shifts channel-wise → ONE (B,T,3C)@(3C,F) GEMM

A plain (B*T, 3C) @ (3C, F) GEMM of identical FLOPs is measured first as a
harness control: if it does not come out near the chip's matmul peak the
timing method is broken and the conv numbers mean nothing.

Each is timed forward-only and as value_and_grad (training shape), chained
K times inside one jit to amortize dispatch. Equivalence is asserted first.

    python scripts/bench_conv_formulations.py [--iters 30]
"""
import argparse
import statistics
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def conv_lax(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding='SAME',
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        precision=jax.lax.Precision.DEFAULT)


def conv_shifted(x, k):
    # SAME k=3: y[t] = x[t-1]@k0 + x[t]@k1 + x[t+1]@k2 (zero-padded ends)
    y = x @ k[1]
    y = y.at[:, 1:].add(x[:, :-1] @ k[0])
    y = y.at[:, :-1].add(x[:, 1:] @ k[2])
    return y


def conv_unfold(x, k):
    b, t, c = x.shape
    zero = jnp.zeros((b, 1, c), x.dtype)
    xm = jnp.concatenate([zero, x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], zero], axis=1)
    xcat = jnp.concatenate([xm, x, xp], axis=-1)       # (B, T, 3C)
    return xcat @ k.reshape(3 * c, -1)                  # kernel (3,C,F)


_RTT_MS = 0.0  # measured single-dispatch+fetch round trip, set in main()


def _measure_rtt(jax, jnp, iters=15):
    tiny = jax.jit(lambda s: s + 1)
    s = jax.device_put(jnp.float32(0))
    tiny(s).item()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        tiny(s).item()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def _timed_chain(step_scalar, args_dev, iters, chain):
    """Median per-application ms of ``chain`` applications UNROLLED inside one
    jit (single dispatch, single scalar fetch), minus the measured dispatch
    round trip.  Applications are chained through a scalar data dependency so
    XLA cannot elide or parallelize them.

    Three rejected harnesses, all caught by the plain-GEMM control:
    a lax.scan chain measured the control at 18 TF/s; one-dispatch-per-
    application measured it at 37 TF/s (per-dispatch overhead through the
    remote tunnel is ~1.3 ms); and chaining via ``x * (1 + s*eps)`` measured
    it at 8128 TF/s — conv/matmul are LINEAR in x, so XLA factored the
    scalar out and computed the op once for the whole chain.  The chain
    must therefore perturb the input through a non-linearity; ``max(x,
    s - 1e9)`` is numerically the identity but opaque to the algebraic
    simplifier (and mirrors the relu that precedes most real convs)."""
    x, k = args_dev

    @jax.jit
    def chained(x, k, s):
        for _ in range(chain):
            s = step_scalar(x, k, s)
        return s

    s0 = jnp.float32(0.0)
    chained(x, k, s0).item()  # warmup + compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        chained(x, k, s0).item()
        ts.append((time.perf_counter() - t0) * 1e3)
    return (statistics.median(ts) - _RTT_MS) / chain


def timed_ms(fn, args_dev, iters, chain=60):
    # the carry must consume the WHOLE output: reading one element lets XLA
    # dead-code each op down to a single output row (measured 1100 "TF/s")
    # sum(y*y), not sum(y): sum(A@B) factors as (1'A)(B1) and the
    # simplifier can skip the GEMM (measured 235 "TF/s" > chip peak)
    def step(x, k, s):
        xi = jnp.maximum(x, (s - 1e9).astype(x.dtype))  # identity, opaque
        y = fn(xi, k).astype(jnp.float32)
        return jnp.sum(y * y) * 1e-12
    return _timed_chain(step, args_dev, iters, chain)


def timed_grad_ms(fn, args_dev, iters, chain=20):
    def loss(x, k):
        return jnp.sum(fn(x, k).astype(jnp.float32) ** 2) * 1e-9
    g = jax.grad(loss, argnums=(0, 1))

    # consume BOTH grads fully — an unread gk would dead-code the wgrad
    def step(x, k, s):
        xi = jnp.maximum(x, (s - 1e9).astype(x.dtype))
        gx, gk = g(xi, k)
        return (jnp.sum(gx.astype(jnp.float32))
                + jnp.sum(gk.astype(jnp.float32))) * 1e-12
    return _timed_chain(step, args_dev, iters, chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--b', type=int, default=64)
    ap.add_argument('--t', type=int, default=256)
    ap.add_argument('--cin', type=int, default=384)
    ap.add_argument('--cout', type=int, default=1536)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    global jax, jnp
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    x = jnp.asarray(rng.standard_normal((args.b, args.t, args.cin)), dt)
    k = jnp.asarray(rng.standard_normal((3, args.cin, args.cout)) * 0.02, dt)
    x, k = jax.device_put(x), jax.device_put(k)

    # equivalence (f32 to avoid bf16 noise in the check)
    xf, kf = x.astype(jnp.float32), k.astype(jnp.float32)
    ref = np.asarray(jax.jit(conv_lax)(xf, kf))
    for name, fn in [('shifted', conv_shifted), ('unfold', conv_unfold)]:
        got = np.asarray(jax.jit(fn)(xf, kf))
        err = np.abs(got - ref).max()
        assert err < 1e-3, f'{name} mismatch {err}'
    print('equivalence ok')

    global _RTT_MS
    _RTT_MS = _measure_rtt(jax, jnp)
    print(f'dispatch+fetch round trip: {_RTT_MS:.1f} ms (subtracted)')

    flops = 2 * args.b * args.t * 3 * args.cin * args.cout
    print(f'shape B{args.b} T{args.t} {args.cin}->{args.cout} k3 {args.dtype}'
          f'  ({flops / 1e9:.1f} GFLOP fwd)')
    print(f'{"formulation":>10} {"fwd ms":>8} {"fwd TF/s":>9} '
          f'{"fwd+bwd ms":>11} {"f+b TF/s":>9}')

    # harness control: identical-FLOPs plain GEMM, no conv semantics at all
    xg = jnp.asarray(
        rng.standard_normal((args.b * args.t, 3 * args.cin)), dt)
    kg = jnp.asarray(
        rng.standard_normal((3, args.cin, args.cout)) * 0.02, dt)

    def gemm(xg, kg):
        return (xg @ kg.reshape(3 * args.cin, -1))[None]

    f = timed_ms(gemm, (jax.device_put(xg), jax.device_put(kg)), args.iters)
    fb = timed_grad_ms(gemm, (jax.device_put(xg), jax.device_put(kg)),
                       args.iters)
    print(f'{"gemm-ctl":>10} {f:8.3f} {flops / f / 1e9:9.1f} '
          f'{fb:11.3f} {3 * flops / fb / 1e9:9.1f}')

    for name, fn in [('conv', conv_lax), ('shifted', conv_shifted),
                     ('unfold', conv_unfold)]:
        f = timed_ms(fn, (x, k), args.iters)
        fb = timed_grad_ms(fn, (x, k), args.iters)
        print(f'{name:>10} {f:8.3f} {flops / f / 1e9:9.1f} '
              f'{fb:11.3f} {3 * flops / fb / 1e9:9.1f}')


if __name__ == '__main__':
    main()
