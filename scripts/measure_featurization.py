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
    p.add_argument('--texts', type=int, default=1000)
    p.add_argument('--workers', type=int, default=8)
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

    measure_phonemization(n_texts=args.texts, workers=args.workers)


def _phonemize_worker(args_tuple):
    texts, backend = args_tuple
    from transformertts_tpu.text.phonemizer import Phonemizer
    global _POOL_PHONEMIZER
    try:
        _POOL_PHONEMIZER
    except NameError:
        _POOL_PHONEMIZER = Phonemizer(language='en-us', with_stress=False,
                                      backend=backend)
    return _POOL_PHONEMIZER(texts)


def measure_phonemization(n_texts: int = 1000, workers: int = 8):
    """Corpus-scale phonemization clips/s (stage-1, VERDICT r2 item 7):
    serial vs process-pool (the create_training_data.py configuration) for
    each available backend. The espeak backend additionally batches all
    clauses through chunked stdin invocations (text/phonemizer.py), so its
    per-clip process overhead is amortized to ~zero."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor
    from transformertts_tpu.text.phonemizer import Phonemizer, _find_espeak

    words = ['the', 'quick', 'brown', 'fox', 'jumped', 'over', 'lazy',
             'dogs', 'while', 'seven', 'wizards', 'watched', 'quietly']
    rng = np.random.default_rng(0)
    texts = [' '.join(rng.choice(words, size=rng.integers(8, 16)))
             + rng.choice([',', '.', '!', '?']) + ' '
             + ' '.join(rng.choice(words, size=rng.integers(4, 10))) + '.'
             for _ in range(n_texts)]

    backends = ['builtin'] + (['espeak'] if _find_espeak() else [])
    for backend in backends:
        p = Phonemizer(language='en-us', with_stress=False, backend=backend)
        t0 = time.perf_counter()
        p(texts)
        dt = time.perf_counter() - t0
        print(f'phonemize[{backend}] single-process (batched list): '
              f'{n_texts} clips in {dt:.2f} s -> {n_texts / dt:,.0f} clips/s')

        # the create_training_data.py path: spawn pool, chunked
        ctx = multiprocessing.get_context('spawn')
        chunk = max(1, n_texts // (workers * 4))
        jobs = [(texts[s:s + chunk], backend)
                for s in range(0, n_texts, chunk)]
        t0 = time.perf_counter()
        with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as ex:
            list(ex.map(_phonemize_worker, jobs))
        dt = time.perf_counter() - t0
        print(f'phonemize[{backend}] {workers}-process pool: '
              f'{n_texts} clips in {dt:.2f} s -> {n_texts / dt:,.0f} clips/s '
              f'(incl. pool spawn)')


if __name__ == '__main__':
    main()
