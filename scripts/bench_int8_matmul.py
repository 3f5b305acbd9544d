"""GO/NO-GO probe for int8 quantized serving: does an s8 x s8 -> s32 GEMM
actually run ~2x bfloat16 on this chip's MXU?

v5e peak is 197 bf16 TFLOP/s vs 394 int8 TOP/s. The synthesis bench is
compute-bound at a 16.9 ms bf16 MXU floor (BASELINE.md synthesis roofline),
so int8 only helps if XLA lowers jnp.dot(int8, int8, preferred=int32) onto
the MXU's int path instead of emulating. This measures the decoder conv
GEMM shapes from the bench workload (B64xT768, unfolded k=3 convs):

    conv1: (49152, 1152) @ (1152, 1536)
    conv2: (49152, 4608) @ (4608, 384)

plus the dequantize epilogue (int32 * row_scale * col_scale -> bf16) so the
number includes the rescale cost a real quantized layer pays.

Usage: python scripts/bench_int8_matmul.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, a, b_stack, extra, iters, outer=3):
    """Time one op amortized over a lax.scan of `iters` applications inside
    ONE dispatch: the axon tunnel costs ~1.3 ms of host/queue bubble per
    dispatch (a 0.07 ms-FLOP GEMM 'measured' 1.35 ms un-scanned), which
    swamps per-op differences.

    The scan iterates over a STACK of distinct weight matrices (xs), not a
    loop-invariant pair — with invariant operands XLA hoists the dot out of
    the loop entirely (measured: per-iter 'time' fell 2558 -> 447 -> 139 us
    as length grew 10 -> 50 -> 200, implying 1252 TF/s on a 197 TF/s part).
    Per-iter weight reads add ~k*n*width bytes (<= 3.5 MB here, ~4 us at
    HBM rate) against ~0.5-0.9 ms of GEMM: noise, and symmetric across
    dtypes."""
    @jax.jit
    def scanned(a, bs):
        def body(c, b):
            return c, jnp.sum(fn(a, b, *extra).astype(jnp.float32))
        _, s = jax.lax.scan(body, 0, bs)
        return s
    float(jnp.sum(scanned(a, b_stack)))  # compile + warm (value fetch = sync)
    best = float('inf')
    for _ in range(outer):
        t0 = time.perf_counter()
        s = scanned(a, b_stack)
        float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ('conv1 (49152,1152)@(1152,1536)', 49152, 1152, 1536),
        ('conv2 (49152,4608)@(4608,384)', 49152, 4608, 384),
        ('proj  (49152,384)@(384,384)', 49152, 384, 384),
    ]
    iters = 32
    for name, m, k, n in shapes:
        a8 = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        b8s = jnp.asarray(rng.integers(-127, 128, (iters, k, n), dtype=np.int8))
        abf = jnp.asarray(rng.standard_normal((m, k), np.float32), jnp.bfloat16)
        bbfs = jnp.asarray(
            rng.standard_normal((iters, k, n), np.float32), jnp.bfloat16)
        sa = jnp.asarray(rng.uniform(0.01, 0.02, (m, 1)), jnp.float32)
        sb = jnp.asarray(rng.uniform(0.01, 0.02, (1, n)), jnp.float32)

        def f_bf16(a, b):
            return jnp.dot(a, b, precision=jax.lax.Precision.DEFAULT)

        def f_int8(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.int32)

        def f_int8_dequant(a, b, ra, cb):
            y = jnp.dot(a, b, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * ra * cb).astype(jnp.bfloat16)

        t_bf = bench(f_bf16, abf, bbfs, (), iters)
        t_i8 = bench(f_int8, a8, b8s, (), iters)
        t_i8d = bench(f_int8_dequant, a8, b8s, (sa, sb), iters)
        flops = 2 * m * k * n
        print(f'{name}:')
        print(f'  bf16        {t_bf*1e3:7.3f} ms  {flops/t_bf/1e12:6.1f} TF/s')
        print(f'  int8        {t_i8*1e3:7.3f} ms  {flops/t_i8/1e12:6.1f} TOP/s'
              f'  speedup {t_bf/t_i8:.2f}x')
        print(f'  int8+deq    {t_i8d*1e3:7.3f} ms  {flops/t_i8d/1e12:6.1f} TOP/s'
              f'  speedup {t_bf/t_i8d:.2f}x')


if __name__ == '__main__':
    main()
