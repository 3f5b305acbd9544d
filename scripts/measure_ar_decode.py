"""Measure the Aligner's autoregressive decode throughput (BASELINE.md row).

The reference's AR predict is a host loop re-running the FULL decoder over
all frames every step with a host stop-sync per iteration
(model/models.py:279-291). Here the whole loop is one on-device
``lax.while_loop`` with KV-cached decoder self-attention and precomputed
cross-attention K/V; this script times it at the published Aligner scale
with r=1 (the costliest setting).

    python scripts/measure_ar_decode.py [--max_length 600] [--reps 5]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from transformertts_tpu.utils.scripts_utils import enable_compilation_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--max_length', type=int, default=600)
    p.add_argument('--reps', type=int, default=5)
    args = p.parse_args()
    enable_compilation_cache()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'mts', Path(__file__).parent / 'measure_train_step.py')
    mts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mts)
    model, _, _ = mts.build_aligner()
    model.set_constants(reduction_factor=1)

    text = ('the quick brown fox jumps over the lazy dog while bright '
            'birds sing about the summer rain falling on the river')
    out = model.predict(text, max_length=args.max_length)   # warm/compile
    n0 = out['n_steps']
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = model.predict(text, max_length=args.max_length)
        times.append(time.perf_counter() - t0)
    # an untrained model never emits the stop token: every run decodes the
    # full max_length frames, which is exactly the worst-case measurement
    frames = out['n_steps'] * model.r
    dt = float(np.median(times))
    print(f'decoded {frames} frames in {dt * 1000:.0f} ms '
          f'(median of {args.reps}; first-run steps={n0}) '
          f'-> {frames / dt:.0f} frames/s')


if __name__ == '__main__':
    main()
