"""Real-TPU existence proof for the Pallas flash-attention kernels.

All of tests/test_flash_attention.py runs interpret=True on CPU; this script
runs the COMPILED kernels on the actual chip: forward and forward+backward
parity vs the jnp reference attention, plus achieved TFLOP/s, at the three
published bucket shapes of the TTS model (2 heads, d_head=192). Results go
in BASELINE.md's flash section. (VERDICT r3 item 3.)

Usage: python scripts/measure_flash_attention.py [--iters 30]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformertts_tpu.nn.attention import _sdpa
    from transformertts_tpu.ops.flash_attention import (
        flash_attention, flash_attention_trainable)

    assert jax.default_backend() == 'tpu', (
        'this is the real-TPU existence proof; run it on the chip '
        f'(backend={jax.default_backend()})')

    shapes = [(64, 2, 256, 192), (32, 2, 512, 192), (16, 2, 896, 192)]
    results = []
    for b, h, t, d in shapes:
        key = jax.random.PRNGKey(b + t)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, t, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, t, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, t, d), jnp.bfloat16)
        # pad the last eighth of keys, framework convention: bias (B, Tk)
        bias = jnp.zeros((b, t), jnp.float32).at[:, t - t // 8:].set(-1e9)
        mask = (bias[:, None, None, :] < 0).astype(jnp.float32)

        # ---- parity: forward
        ref, _ = jax.jit(_sdpa, static_argnums=(4, 6))(
            q, k, v, mask, 0.0, None, True)
        out = flash_attention(q, k, v, bias, interpret=False)
        fwd_err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))

        # ---- parity: gradients through the trainable variant
        def loss_flash(args):
            return jnp.sum(flash_attention_trainable(
                *args, bias, interpret=False).astype(jnp.float32) ** 2)

        def loss_ref(args):
            o, _ = _sdpa(*args, mask, 0.0, None, True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(loss_flash))((q, k, v))
        gr = jax.jit(jax.grad(loss_ref))((q, k, v))
        grad_err = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - r.astype(jnp.float32))))
            for a, r in zip(gf, gr))
        grad_scale = max(
            float(jnp.max(jnp.abs(r.astype(jnp.float32)))) for r in gr)

        # ---- perf: chained executions, sync by fetch (tunnel-safe)
        fwd = jax.jit(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, bias, interpret=False))
        o = fwd(q, k, v)
        float(o[0, 0, 0, 0])
        t0 = time.perf_counter()
        x = q
        for _ in range(args.iters):
            o = fwd(x, k, v)
            x = o  # chain to defeat CSE across calls
        float(x[0, 0, 0, 0])
        dt_fwd = (time.perf_counter() - t0) / args.iters

        grad_fn = jax.jit(jax.grad(loss_flash))
        g = grad_fn((q, k, v))
        float(g[0][0, 0, 0, 0])
        t0 = time.perf_counter()
        x = q
        for _ in range(args.iters):
            g = grad_fn((x, k, v))
            x = g[0]
        float(x[0, 0, 0, 0])
        dt_fb = (time.perf_counter() - t0) / args.iters

        # ---- jnp reference perf on identical shapes
        ref_fwd = jax.jit(lambda q_, k_, v_: _sdpa(
            q_, k_, v_, mask, 0.0, None, True)[0])
        o = ref_fwd(q, k, v)
        float(o[0, 0, 0, 0])
        t0 = time.perf_counter()
        x = q
        for _ in range(args.iters):
            o = ref_fwd(x, k, v)
            x = o
        float(x[0, 0, 0, 0])
        dt_ref = (time.perf_counter() - t0) / args.iters

        ref_grad = jax.jit(jax.grad(loss_ref))
        g = ref_grad((q, k, v))
        float(g[0][0, 0, 0, 0])
        t0 = time.perf_counter()
        x = q
        for _ in range(args.iters):
            g = ref_grad((x, k, v))
            x = g[0]
        float(x[0, 0, 0, 0])
        dt_ref_fb = (time.perf_counter() - t0) / args.iters

        # attention FLOPs: 2 GEMMs fwd (4*b*h*t*t*d), ~2.5x for bwd
        flops_fwd = 4 * b * h * t * t * d
        row = {
            'shape': f'B{b} H{h} T{t} D{d}',
            'fwd_max_abs_err': round(fwd_err, 6),
            'grad_max_abs_err': round(grad_err, 5),
            'grad_scale': round(grad_scale, 1),
            'flash_fwd_ms': round(dt_fwd * 1e3, 3),
            'flash_fwd_tflops': round(flops_fwd / dt_fwd / 1e12, 1),
            'flash_fwdbwd_ms': round(dt_fb * 1e3, 3),
            'jnp_fwd_ms': round(dt_ref * 1e3, 3),
            'jnp_fwdbwd_ms': round(dt_ref_fb * 1e3, 3),
        }
        results.append(row)
        print(row, flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
