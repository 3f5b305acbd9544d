"""Sweep XLA:TPU compiler options over the production training step.

The round-4 roofline left the TTS training step at 66-68% of its HBM bound
with the residual attributed to fusion-boundary copies (~5 GB/step) and
convolution custom-calls (~4.1 GB/step) — compiler-owned traffic. This
script asks the compiler to make different choices: it lowers the step ONCE
and recompiles it under a matrix of `compiler_options` (the public
DebugOptions XLA flags, passed per-compile through PJRT so they work through
the remote tunnel), timing each executable back-to-back on the chip.

Also sweeps the Conv1D lowering formulation (see nn/core.CONV1D_FORMULATION)
against the conv custom-call traffic.

    python scripts/sweep_xla_flags.py [--iters 20] [--bucket 0]

Prints one row per (bucket, config): device ms/step and delta vs the
default compile. Options that the installed compiler rejects are reported
as 'rejected' and skipped.
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from measure_train_step import build, make_batch  # noqa: E402

# name -> compiler_options dict. Chosen at the named residual: bigger /
# differently-scheduled fusions and copy elision. All are public
# DebugOptions fields; unknown ones on this compiler version are skipped.
CONFIGS = [
    ('default', {}),
    ('vmem_32m', {'xla_tpu_scoped_vmem_limit_kib': '32768'}),
    ('vmem_64m', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('vmem_96m', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('lhs', {'xla_tpu_enable_latency_hiding_scheduler': 'true'}),
    ('no_rwb_fusion', {'xla_tpu_rwb_fusion': 'false'}),
    ('dot_dot_fusion', {'xla_tpu_dot_dot_fusion': 'true'}),
    ('dot_dot_dup', {'xla_tpu_dot_dot_fusion_duplicated': 'true'}),
    ('licm_2x', {'xla_tpu_licm_size_inflation_ratio': '2'}),
    ('flops_sched', {'xla_tpu_order_dot_after_layout': 'false'}),
    ('vmem_64m+lhs', {'xla_tpu_scoped_vmem_limit_kib': '65536',
                      'xla_tpu_enable_latency_hiding_scheduler': 'true'}),
]

BUCKETS = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]


def time_compiled(compiled, state, dbatch, iters):
    import jax
    import jax.numpy as jnp
    # train_step donates state: feed a fresh COPY so the caller's `state`
    # buffers survive for the next config, then chain the returned state.
    s0 = jax.tree.map(jnp.copy, state)
    s, aux = compiled(s0, dbatch)
    float(aux['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, aux = compiled(s, dbatch)
    float(aux['loss'])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--bucket', type=int, default=None)
    ap.add_argument('--formulation', default=None,
                    choices=['lax', 'shifted', 'unfold'],
                    help='override Conv1D lowering for ALL configs')
    ap.add_argument('--configs', default=None,
                    help='comma-separated config names to run (default all)')
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    if args.formulation:
        import transformertts_tpu.nn.core as core
        core.CONV1D_FORMULATION = args.formulation
        print(f'Conv1D formulation: {args.formulation}', flush=True)
    import jax

    names = set(args.configs.split(',')) if args.configs else None
    configs = [(n, o) for n, o in CONFIGS
               if names is None or n in names or n == 'default']
    model, trainer, state = build()
    rng = np.random.default_rng(0)
    buckets = BUCKETS if args.bucket is None else [BUCKETS[args.bucket]]
    for n_frames, b, n_tok in buckets:
        batch = make_batch(model, b, n_tok, n_frames, rng)
        dbatch = trainer.shard_batch(batch)
        # the jitted step is built lazily on first call; feed a copy since
        # the step donates its input state
        import jax.numpy as jnp
        s, aux = trainer.train_step(jax.tree.map(jnp.copy, state), dbatch)
        float(aux['loss'])
        del s, aux
        lowered = trainer._train_step.lower(state, dbatch)
        base_ms = None
        print(f'\nbucket B{b}x{n_frames}f  ({args.iters} iters each)', flush=True)
        print(f'{"config":>16} {"ms/step":>9} {"delta":>8}', flush=True)
        for name, opts in configs:
            try:
                compiled = lowered.compile(compiler_options=opts) if opts \
                    else lowered.compile()
            except Exception as e:  # rejected option on this jaxlib
                print(f'{name:>16} {"rejected":>9}   {str(e)[:60]}', flush=True)
                continue
            dt = time_compiled(compiled, state, dbatch, args.iters) * 1e3
            if base_ms is None and name == 'default':
                base_ms = dt
            delta = f'{dt - base_ms:+7.1f}' if base_ms is not None else ''
            print(f'{name:>16} {dt:9.2f} {delta:>8}', flush=True)
            del compiled


if __name__ == '__main__':
    main()
