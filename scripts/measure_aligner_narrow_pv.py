"""Store-narrow / return-exact PV boundary on the FLOAT32 aligner: both
sides of the trade, measured.

The f32 aligner step is 56-71% of its HBM bound with ~286 MB f32 attention
maps named as the largest traffic entries (BASELINE.md aligner roofline).
`nn/attention.F32_NARROW_PV` reuses the synthesis path's numerator-boundary
trick for f32 compute: the PV matmul consumes a bf16 rounding of the
unnormalized softmax numerator (single MXU pass, half-width stream) while
the RETURNED normalized weights — the aligner teacher losses' and duration
extraction's input — stay exact f32.

These measurements made narrow-PV the AlignerTrainer DEFAULT (round 5):
31.5/36.2/41.7 -> 30.1/31.5/36.4 ms/step, equivalent convergence, 100%
same-weights duration agreement. The trainer applies it per-trace
(narrow_pv=True), so this script toggles trainer.narrow_pv, not the module
global.

Measures:
1. perf: published-scale aligner train step (r=1, all three buckets),
   plain f32 vs narrow-PV;
2. fidelity: on the synthetic ground-truth language
   (tests/convergence_check.py) — train an aligner with narrow-PV ON and
   compare final loss + extracted-duration MAE vs the f32 default, plus the
   same-weights inference check (f32-trained weights, narrow-PV forward:
   token-level duration agreement with the default forward).

Run on the real chip:

    python scripts/measure_aligner_narrow_pv.py [--steps 2500] [--iters 20]
    python scripts/measure_aligner_narrow_pv.py --perf_only [--bucket N]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / 'tests'))
sys.path.insert(0, str(Path(__file__).parent))


def measure_step(narrow: bool, iters: int, bucket):
    import jax
    from measure_train_step import build_aligner
    model, trainer, state = build_aligner()   # fresh jit caches per arm
    trainer.narrow_pv = narrow   # read at trace time by _attention_scope
    rng = np.random.default_rng(0)
    vocab = model.text_pipeline.tokenizer.vocab_size
    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    if bucket is not None:
        buckets = [buckets[bucket]]
    out = []
    for n_frames, b, n_tok in buckets:
        tokens = np.zeros((b, n_tok), np.int32)
        tokens[:, :int(n_tok * 0.9)] = rng.integers(
            1, vocab, size=(b, int(n_tok * 0.9)))
        mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
        stop = np.ones((b, n_frames), np.int32)
        stop[:, -1] = 2
        dbatch = trainer.shard_batch(
            {'tokens': tokens, 'mel': mel, 'stop_probs': stop})
        # train_step donates its input state: chain the returns, never
        # reuse a state object that has already been passed in
        state, aux = trainer.train_step(state, dbatch, r=1)
        float(aux['loss'])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = trainer.train_step(state, dbatch, r=1)
        float(aux['loss'])
        dt = (time.perf_counter() - t0) / iters
        out.append(round(dt * 1e3, 2))
        print(f'  narrow={narrow} B{b}x{n_frames}f: {dt * 1e3:.2f} ms/step',
              flush=True)
    return out


def measure_fidelity(steps: int):
    from convergence_check import aligner_convergence
    from transformertts_tpu.models.aligner import Aligner
    from transformertts_tpu.ops.duration_extraction import (
        get_durations_from_alignment)
    from transformertts_tpu.training import AlignerTrainer, make_optimizer

    print('=== f32 plain-path training arm ===', flush=True)
    base = aligner_convergence(steps=steps, return_artifacts=True,
                               narrow_pv=False)
    print('=== narrow-PV training arm (same data/seeds/dropout) ===',
          flush=True)
    narrow = aligner_convergence(steps=steps, return_artifacts=True,
                                 narrow_pv=True)

    # same-weights inference: plain-f32-trained params through a narrow-PV
    # forward
    model_n = Aligner.from_config(dict(base['model'].config))
    trainer_n = AlignerTrainer(
        model_n, make_optimizer([(0, 3e-4), (10**6, 3e-4)]), narrow_pv=True)
    state_n = trainer_n.init_state(params=base['state'].params)
    batch = base['batch_of'](np.arange(8))
    aux = trainer_n.val_step(state_n, batch, r=1)
    attn = np.asarray(
        aux['decoder_attention']['Decoder_LastBlock_CrossAttention'])[:8]
    dur_n, _, _, _, _ = get_durations_from_alignment(
        attn, batch['mel'][:8], batch['tokens'][:8], weighted=True)

    samples = base['samples']
    agree, total, errs = 0, 0, []
    for i in range(8):
        true_d = samples[i][1]
        a = base['durations'][i].astype(np.float32)[:len(true_d)]
        b = dur_n[i].astype(np.float32)[:len(true_d)]
        agree += int(np.sum(a == b))
        total += len(true_d)
        errs.append(np.abs(b - true_d).mean())
    return {
        'f32_duration_mae': base['duration_mae'],
        'narrow_pv_duration_mae': narrow['duration_mae'],
        'f32_final_loss': base['final_loss'],
        'narrow_pv_final_loss': narrow['final_loss'],
        'same_weights_narrow_inference_mae': float(np.mean(errs)),
        'same_weights_duration_agreement': agree / total,
        'steps': steps,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=2500)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--bucket', type=int, default=None)
    ap.add_argument('--perf_only', action='store_true')
    ap.add_argument('--fidelity_only', action='store_true')
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()

    result = {}
    if not args.fidelity_only:
        print('-- perf: published-scale aligner step, r=1 --', flush=True)
        result['default_ms'] = measure_step(False, args.iters, args.bucket)
        result['narrow_pv_ms'] = measure_step(True, args.iters, args.bucket)
    if not args.perf_only:
        result.update(measure_fidelity(args.steps))
    print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
