"""Direct A/B of the landed remat attention vs the plain path, alternating
arms within one process to cancel chip drift. Usage:
  python scripts/ab_remat_landed.py [--model tts|aligner] [--bucket 2] [--reps 4]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from measure_train_step import build, build_aligner, make_batch  # noqa: E402


def make_aligner_batch(model, b, n_tok, n_frames, rng):
    vocab = model.text_pipeline.tokenizer.vocab_size
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[:, :int(n_tok * 0.9)] = rng.integers(
        1, vocab, size=(b, int(n_tok * 0.9)))
    mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
    stop = np.ones((b, n_frames), np.int32)
    stop[:, -1] = 2
    return {'tokens': tokens, 'mel': mel, 'stop_probs': stop}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='tts')
    ap.add_argument('--bucket', type=int, default=2)
    ap.add_argument('--iters', type=int, default=15)
    ap.add_argument('--reps', type=int, default=4)
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    from transformertts_tpu.nn import attention as am

    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    n_frames, b, n_tok = buckets[args.bucket]

    remat_fn = am.scaled_dot_product_attention

    def plain_fn(q, k, v, mask, dropout_rate=0.0, rng=None,
                 deterministic=True):
        return am._sdpa(q, k, v, mask, dropout_rate, rng, deterministic)

    def measure(fn):
        am.scaled_dot_product_attention = fn
        try:
            rng = np.random.default_rng(0)
            if args.model == 'aligner':
                model, trainer, state = build_aligner()
                extra = dict(r=1)
                batch = make_aligner_batch(model, b, n_tok, n_frames, rng)
            else:
                model, trainer, state = build()
                extra = {}
                batch = make_batch(model, b, n_tok, n_frames, rng)
            dbatch = trainer.shard_batch(batch)
            s, aux = trainer.train_step(state, dbatch, **extra)
            float(aux['loss'])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, aux = trainer.train_step(s, dbatch, **extra)
            float(aux['loss'])
            return (time.perf_counter() - t0) / args.iters * 1e3
        finally:
            am.scaled_dot_product_attention = remat_fn

    plain_ts, remat_ts = [], []
    for rep in range(args.reps):
        plain_ts.append(measure(plain_fn))
        remat_ts.append(measure(remat_fn))
        print(f'rep {rep}: plain {plain_ts[-1]:.2f}  remat {remat_ts[-1]:.2f}',
              flush=True)
    print(f'median plain {np.median(plain_ts):.2f} ms  '
          f'remat {np.median(remat_ts):.2f} ms  '
          f'delta {np.median(plain_ts) - np.median(remat_ts):+.2f}')


if __name__ == '__main__':
    main()
