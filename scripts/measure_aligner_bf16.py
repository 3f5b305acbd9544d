"""bf16 aligner training: convergence + duration-quality evidence.

The aligner trains float32 by default because its cross-attention maps are
the duration-extraction input (reference extracts durations from the trained
aligner's last-block cross-attention, models.py:258-276) — a compute-dtype
change is a training-semantics change, not a free perf knob. The round-4
aligner roofline (BASELINE.md) shows bf16 compute cuts the published-scale
step 29.9/38.2/45.7 → 14.1/21.4/29.2 ms. This script supplies the quality
side of that trade on the synthetic ground-truth language from
tests/convergence_check.py:

1. Train the same tiny aligner f32 vs bf16 (identical data, seeds, and
   dropout draws) and compare final loss + extracted-duration MAE against
   the *known* ground-truth durations.
2. Same-weights inference check: run the f32-TRAINED weights through a bf16
   forward and compare the extracted durations token-by-token against the
   f32 forward — isolates the inference-dtype effect on the
   `extract_durations.py` path.

Run on the real chip (tiny model — minutes, dispatch-bound):

    python scripts/measure_aligner_bf16.py [--steps 2500]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / 'tests'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=2500)
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    from convergence_check import aligner_convergence

    print('=== f32 training arm ===')
    f32 = aligner_convergence(steps=args.steps, compute_dtype='float32',
                              return_artifacts=True)
    print('=== bf16 training arm (same data/seeds/dropout draws) ===')
    bf16 = aligner_convergence(steps=args.steps, compute_dtype='bfloat16',
                               return_artifacts=True)

    # -- same-weights inference check: f32-trained params, bf16 forward ----
    from transformertts_tpu.models.aligner import Aligner
    from transformertts_tpu.ops.duration_extraction import (
        get_durations_from_alignment)
    from transformertts_tpu.training import AlignerTrainer, make_optimizer

    cfg = dict(f32['model'].config)
    cfg['compute_dtype'] = 'bfloat16'
    model_bf = Aligner.from_config(cfg)
    trainer_bf = AlignerTrainer(
        model_bf, make_optimizer([(0, 3e-4), (10**6, 3e-4)]))
    state_bf = trainer_bf.init_state(params=f32['state'].params)
    batch = f32['batch_of'](np.arange(8))
    aux = trainer_bf.val_step(state_bf, batch, r=1)
    attn = np.asarray(
        aux['decoder_attention']['Decoder_LastBlock_CrossAttention'])[:8]
    dur_bf, _, _, _, _ = get_durations_from_alignment(
        attn, batch['mel'][:8], batch['tokens'][:8], weighted=True)

    samples = f32['samples']
    agree, total, errs = 0, 0, []
    for i in range(8):
        true_d = samples[i][1]
        a = f32['durations'][i].astype(np.float32)[:len(true_d)]
        b = dur_bf[i].astype(np.float32)[:len(true_d)]
        agree += int(np.sum(a == b))
        total += len(true_d)
        errs.append(np.abs(b - true_d).mean())
    mae_bf_inference = float(np.mean(errs))
    agreement = agree / total

    result = {
        'f32_duration_mae': f32['duration_mae'],
        'bf16_duration_mae': bf16['duration_mae'],
        'f32_final_loss': f32['final_loss'],
        'bf16_final_loss': bf16['final_loss'],
        'same_weights_bf16_inference_mae': mae_bf_inference,
        'same_weights_duration_agreement': agreement,
        'steps': args.steps,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
