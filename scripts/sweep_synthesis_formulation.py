"""Full-graph A/B of Conv1D lowering formulations × batch size on synthesis.

Round-3 established the conv lowering is near-peak IN ISOLATION
(bench_conv_formulations.py), but the round-5 profile of the full bench
dispatch shows ~1.0 ms/dispatch of {1,2,0}<->{2,0,1} layout copies around the
twelve decoder conv blocks — a layout-assignment disagreement between
lax.conv and the surrounding dots that an isolated microbench cannot see.
This measures the real bench.py workload end-to-end for each formulation
(core.CONV1D_FORMULATION) and batch size, with equivalence asserted against
the 'lax' output.

    python scripts/sweep_synthesis_formulation.py [--iters 20]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--batches', type=int, nargs='+', default=[64, 96, 128])
    ap.add_argument('--forms', nargs='+', default=['lax', 'shifted', 'unfold'])
    ap.add_argument('--n_frames', type=int, default=768)
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformertts_tpu.nn import core
    from bench import build_model

    model = build_model()
    params = model.params
    n_frames = args.n_frames

    def synth(params, tokens):
        return model.apply(params, tokens, max_frames=n_frames,
                           deterministic=True)['mel']

    rng = np.random.default_rng(0)
    ref_mel = {}
    print(f'{"form":>8} {"B":>4} {"ms/disp":>8} {"frames/s":>10} '
          f'{"max|d| vs lax":>14}')
    for b in args.batches:
        tokens = jnp.asarray(rng.integers(
            1, model.text_pipeline.tokenizer.vocab_size,
            size=(b, 128), dtype=np.int32))
        for form in args.forms:
            core.CONV1D_FORMULATION = form
            try:
                fn = jax.jit(synth)
                mel = fn(params, tokens)
                float(jnp.sum(mel))  # compile+sync (tunnel: fetch syncs)
                if form == 'lax':
                    ref_mel[b] = np.asarray(mel[:2, :64, :8], np.float32)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(
                        np.asarray(mel[:2, :64, :8], np.float32)
                        - ref_mel[b])))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    mel = fn(params, tokens)
                float(jnp.sum(mel))
                dt = (time.perf_counter() - t0) / args.iters
                print(f'{form:>8} {b:>4} {dt * 1e3:>8.2f} '
                      f'{b * n_frames / dt:>10.0f} {err:>14.2e}')
            finally:
                core.CONV1D_FORMULATION = 'lax'


if __name__ == '__main__':
    main()
