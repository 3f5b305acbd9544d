"""Measure dataset-featurization throughput (BASELINE.md row).

Times the fused Pallas mel frontend (framing + windowed-GEMM DFT +
magnitude + mel projection + log compression in one kernel,
ops/stft_pallas.py) and the batched YIN pitch estimator on a batch of
10-second clips — the stage-1 preprocessing hot path that replaces
per-clip host librosa + pyworld.

    python scripts/measure_featurization.py [--batch 16] [--seconds 10]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from transformertts_tpu.utils.scripts_utils import enable_compilation_cache

SR = 22050


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--seconds', type=float, default=10.0)
    p.add_argument('--reps', type=int, default=10)
    args = p.parse_args()
    enable_compilation_cache()

    import jax.numpy as jnp
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.audio.pitch import yin_f0

    audio = Audio(sampling_rate=SR, n_fft=1024, mel_channels=80,
                  hop_length=256, win_length=1024, f_min=0, f_max=8000,
                  normalizer='MelGAN')
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * args.seconds)) / SR
    wavs = np.stack([
        (0.4 * np.sin(2 * np.pi * rng.uniform(100, 250) * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        for _ in range(args.batch)])
    total_audio_s = args.batch * args.seconds

    def run_mel():
        pad = audio.n_fft // 2
        centered = jnp.pad(jnp.asarray(wavs), ((0, 0), (pad, pad)))
        mel = audio.log_mel_batch_centered(centered)
        return float(jnp.sum(mel[:, -1, -1]))

    def run_pitch():
        f0 = yin_f0(jnp.asarray(wavs[0]), SR, 256)
        return float(jnp.sum(f0))

    run_mel(); run_pitch()   # warm/compile
    t0 = time.perf_counter()
    for _ in range(args.reps):
        run_mel()
    dt = (time.perf_counter() - t0) / args.reps
    print(f'fused mel frontend: {args.batch}x{args.seconds:.0f}s clips in '
          f'{dt * 1000:.1f} ms -> {total_audio_s / dt:,.0f}x realtime')
    t0 = time.perf_counter()
    for _ in range(args.reps):
        run_pitch()
    dt = (time.perf_counter() - t0) / args.reps
    print(f'YIN pitch (1 clip): {args.seconds:.0f}s in {dt * 1000:.1f} ms '
          f'-> {args.seconds / dt:,.0f}x realtime')


if __name__ == '__main__':
    main()
