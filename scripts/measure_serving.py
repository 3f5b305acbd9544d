"""Measure steady-state batched-serving throughput (BASELINE.md row).

Builds the published-scale ForwardTransformer, synthesizes a mixed-length
128-sentence workload through `models/synthesis.synthesize_lines`, and
reports sentences/s after a full warm pass (the warm pass compiles the
executable menu; with the persistent XLA compile cache that cost is
once per machine).

    python scripts/measure_serving.py [--max_batch 64] [--lines 128]
                                      [--reps 3] [--data_parallel N]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from transformertts_tpu.utils.scripts_utils import enable_compilation_cache

WORDS = ('the quick brown fox jumps over a lazy dog near riverbank '
         'today').split()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--max_batch', type=int, default=64)
    p.add_argument('--lines', type=int, default=128)
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--data_parallel', type=int, default=1)
    p.add_argument('--vocoder', choices=['none', 'melgan'], default='none',
                   help="'melgan': published-topology MelGAN generator "
                        '(random params — measures the compute path)')
    args = p.parse_args()
    enable_compilation_cache()

    import bench
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models.synthesis import synthesize_lines

    model = bench.build_model()
    audio = Audio(sampling_rate=22050, n_fft=1024, mel_channels=80,
                  hop_length=256, win_length=1024, f_min=0, f_max=8000,
                  normalizer='MelGAN')
    vocoder = None
    if args.vocoder == 'melgan':
        import jax
        from transformertts_tpu.models.melgan import MelGANVocoder
        vocoder = MelGANVocoder(mel_channels=80)   # hop 256, published scale
        vocoder.init_params(jax.random.PRNGKey(0))
    mesh = None
    if args.data_parallel > 1:
        import jax
        from transformertts_tpu.parallel import MeshConfig, make_mesh
        mesh = make_mesh(MeshConfig(data=args.data_parallel, model=1),
                         devices=jax.devices()[:args.data_parallel])
    rng = np.random.default_rng(0)
    lines = [' '.join(rng.choice(WORDS, size=rng.integers(6, 16))) + '.'
             for _ in range(args.lines)]

    t0 = time.perf_counter()
    synthesize_lines(model, audio, lines, max_batch=args.max_batch,
                     mesh=mesh, vocoder=vocoder)
    print(f'warm pass: {time.perf_counter() - t0:.1f}s', flush=True)
    for rep in range(args.reps):
        t0 = time.perf_counter()
        wavs = synthesize_lines(model, audio, lines,
                                max_batch=args.max_batch, mesh=mesh,
                                vocoder=vocoder)
        dt = time.perf_counter() - t0
        secs = sum(len(w) for w in wavs) / 22050
        print(f'rep{rep}: {len(lines) / dt:.0f} sentences/s, '
              f'{secs / dt:.0f}x realtime ({dt * 1000:.0f} ms)', flush=True)


if __name__ == '__main__':
    main()
