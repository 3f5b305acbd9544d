"""Sweep XLA:TPU compiler options over the bench.py synthesis dispatch.

Round-5 profiling (BASELINE.md synthesis roofline, round-5 update) puts the
synthesis dispatch at 21.1 ms device-busy vs a 16.9 ms MXU floor, with the
twelve large decoder conv fusions AT roofline and the device-side residual
in layout copies (~1.0 ms), data formatting (~0.8 ms) and loop fusions
(~1.2 ms). This sweep asks the compiler for different layout/fusion/
scheduling choices on the SAME lowering (per-compile `compiler_options`
through PJRT — works through the tunnel).

    python scripts/sweep_synthesis_flags.py [--iters 20]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

CONFIGS = [
    ('default', {}),
    ('lhs', {'xla_tpu_enable_latency_hiding_scheduler': 'true'}),
    ('vmem_64m', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('no_rwb_fusion', {'xla_tpu_rwb_fusion': 'false'}),
    ('flops_sched', {'xla_tpu_order_dot_after_layout': 'false'}),
    ('licm_2x', {'xla_tpu_licm_size_inflation_ratio': '2'}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import bench
    import jax
    import jax.numpy as jnp

    model = bench.build_model()
    params = model.params
    batch, n_tok, n_frames = 64, 128, 768

    def synth(params, tokens):
        return model.apply(params, tokens, max_frames=n_frames,
                           deterministic=True)['mel']

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size,
        size=(batch, n_tok), dtype=np.int32))
    lowered = jax.jit(synth).lower(params, tokens)
    results = {}
    print(f'{"config":>16} {"ms":>8} {"frames/s":>10}', flush=True)
    for name, opts in CONFIGS:
        try:
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
        except Exception as e:
            print(f'{name:>16} rejected  {str(e)[:60]}', flush=True)
            continue
        mel = compiled(params, tokens)
        float(jnp.sum(mel))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            mel = compiled(params, tokens)
        float(jnp.sum(mel))
        dt = (time.perf_counter() - t0) / args.iters
        fps = batch * n_frames / dt
        results[name] = round(fps)
        print(f'{name:>16} {dt * 1e3:8.2f} {fps:10.0f}', flush=True)
        del compiled
    print(json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
