"""Second-stage int8 GO probe: which LOWERING of a quantized k=3 SAME conv
is fastest, measured end-to-end including the activation-quantize step?

`bench_int8_matmul.py` established the raw s8xs8->s32 GEMM runs 1.3-1.4x
bf16 at the decoder conv shapes. A real quantized conv layer also pays:
  - quantize x: round(x/act_scale) -> int8 (elementwise, should fuse)
  - the k=3 unfold (materialized concat, or k shifted dots, or lax conv)
  - dequant + bias + relu epilogue
This measures three formulations against the bf16 lax-conv control at the
bench decoder shapes (B64xT768: conv1 384->1536, conv2 1536->384):

  lax     : lax.conv_general_dilated on int8 NWC operands -> s32
  unfold  : quantize, concat 3 time-shifts channel-wise, ONE s8 GEMM
  shifted : quantize, pad time by 1 each side, 3 full-length s8 GEMMs summed

All include dequant(act_scale*col_scale)+bias+relu and return bf16.
Weights iterate over a stacked scan axis so nothing hoists (see
bench_int8_matmul.py for why).

Usage: python scripts/bench_int8_conv_forms.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(make_fn, x, w_stack, extras, iters, outer=3):
    @jax.jit
    def scanned(x, ws):
        def body(c, w):
            return c, jnp.sum(make_fn(x, w, *extras).astype(jnp.float32))
        _, s = jax.lax.scan(body, 0, ws)
        return s
    float(jnp.sum(scanned(x, w_stack)))
    best = float('inf')
    for _ in range(outer):
        t0 = time.perf_counter()
        s = scanned(x, w_stack)
        float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    B, T = 64, 768
    shapes = [('conv1 384->1536', 384, 1536), ('conv2 1536->384', 1536, 384)]
    iters = 16
    k, half = 3, 1
    for name, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((B, T, cin), np.float32),
                        jnp.bfloat16)
        wbf = jnp.asarray(
            rng.standard_normal((iters, k, cin, cout), np.float32) * 0.05,
            jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (iters, k, cin, cout),
                                      dtype=np.int8))
        col = jnp.asarray(rng.uniform(3e-4, 5e-4, (cout,)), jnp.float32)
        act = jnp.float32(4.0 / 127.0)
        bias = jnp.asarray(rng.standard_normal((cout,), np.float32) * 0.01)

        def quant(x):
            return jnp.clip(jnp.round(x.astype(jnp.float32) / act),
                            -127, 127).astype(jnp.int8)

        def epilogue(y32, xdtype):
            y = y32.astype(jnp.float32) * (act * col) + bias
            return jax.nn.relu(y).astype(xdtype)

        def f_bf16_lax(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1,), 'SAME', dimension_numbers=('NWC', 'WIO', 'NWC'),
                precision=jax.lax.Precision.DEFAULT)
            return jax.nn.relu(y + bias.astype(y.dtype)).astype(x.dtype)

        def f_i8_lax(x, w):
            xq = quant(x)
            y32 = jax.lax.conv_general_dilated(
                xq, w, (1,), 'SAME', dimension_numbers=('NWC', 'WIO', 'NWC'),
                preferred_element_type=jnp.int32)
            return epilogue(y32, x.dtype)

        def f_i8_unfold(x, w):
            xq = quant(x)
            shifts = [jnp.pad(xq[:, max(s, 0): T + min(s, 0)],
                              [(0, 0), (-min(s, 0), max(s, 0)), (0, 0)])
                      for s in (-1, 0, 1)]
            xcat = jnp.concatenate(shifts, axis=-1)
            y32 = jnp.dot(xcat, w.reshape(k * cin, cout),
                          preferred_element_type=jnp.int32)
            return epilogue(y32, x.dtype)

        def f_i8_shifted(x, w):
            xq = quant(x)
            xp = jnp.pad(xq, [(0, 0), (half, half), (0, 0)])
            y32 = sum(jnp.dot(xp[:, s:s + T], w[s],
                              preferred_element_type=jnp.int32)
                      for s in range(k))
            return epilogue(y32, x.dtype)

        rows = [('bf16 lax (control)', f_bf16_lax, wbf),
                ('int8 lax conv', f_i8_lax, w8),
                ('int8 unfold GEMM', f_i8_unfold, w8),
                ('int8 shifted GEMMs', f_i8_shifted, w8)]
        print(f'{name}  (B{B}xT{T}, k=3, {2 * B * T * k * cin * cout / 1e9:.0f} GFLOP)')
        t0 = None
        for label, fn, ws in rows:
            try:
                t = timed(fn, x, ws, (), iters)
            except Exception as e:  # a form may simply not lower on TPU
                print(f'  {label:22s} FAILED: {type(e).__name__}: {e}')
                continue
            t0 = t if t0 is None else t0
            print(f'  {label:22s} {t * 1e3:7.3f} ms   speedup {t0 / t:.2f}x')


if __name__ == '__main__':
    main()
