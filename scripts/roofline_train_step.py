"""Roofline analysis of the training step: is the measured ms/step
compute-bound (MXU) or bandwidth-bound (HBM), and how close to the bound?

For each published bucket this measures the device step time (same method as
measure_train_step.py), pulls FLOPs and bytes-accessed from XLA's cost
analysis of the compiled optimized HLO (post-fusion, so bytes ≈ HBM traffic:
fusion intermediates are not counted), and prints

    t_mxu  = flops / peak_flops      (ideal compute time)
    t_hbm  = bytes / peak_bw         (ideal memory time)
    bound  = max(t_mxu, t_hbm)       (roofline: perfect overlap assumed)
    eff    = bound / measured        (1.0 = at the roofline)

Also prints an analytic *lower* bound on unavoidable HBM traffic from the
parameter/optimizer state alone (Adam reads p,m,v,g and writes p,m,v →
7 float32 copies of the parameter count per step), since cost-analysis bytes
can overcount re-read operands.

Peaks default to TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM
(public chip specs; override with --peak_tflops/--peak_gbps for other chips).

    python scripts/roofline_train_step.py [--model tts] [--iters 20]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from measure_train_step import build, build_aligner, make_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--model', choices=['tts', 'aligner'], default='tts')
    ap.add_argument('--r', type=int, default=1)
    ap.add_argument('--dtype', choices=['float32', 'bfloat16'],
                    default='float32', help='aligner only: compute dtype')
    ap.add_argument('--bucket', type=int, default=None)
    ap.add_argument('--peak_tflops', type=float, default=197.0)
    ap.add_argument('--peak_gbps', type=float, default=819.0)
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes — CPU smoke test of the HLO parsing')
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax

    rng = np.random.default_rng(0)
    if args.model == 'aligner':
        model, trainer, state = build_aligner(compute_dtype=args.dtype)
    else:
        model, trainer, state = build()
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    adam_bytes = 7 * 4 * n_params  # read p,m,v,g + write p,m,v, float32
    print(f'params: {n_params / 1e6:.1f} M — Adam step floor '
          f'{adam_bytes / 1e9:.2f} GB ≥ {adam_bytes / args.peak_gbps / 1e6:.1f} ms')
    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    if args.bucket is not None:
        buckets = [buckets[args.bucket]]
    if args.tiny:
        buckets = [(32, 2, 12)]
    hdr = (f'{"bucket":>20} {"meas ms":>8} {"GFLOP":>8} {"GB":>7} '
           f'{"t_mxu":>7} {"t_hbm":>7} {"bound":>12} {"eff":>6}')
    print(hdr)
    rows = []
    for n_frames, b, n_tok in buckets:
        if args.model == 'aligner':
            vocab = model.text_pipeline.tokenizer.vocab_size
            tokens = np.zeros((b, n_tok), np.int32)
            tokens[:, :int(n_tok * 0.9)] = rng.integers(
                1, vocab, size=(b, int(n_tok * 0.9)))
            mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
            stop = np.ones((b, n_frames), np.int32)
            stop[:, -1] = 2
            batch = {'tokens': tokens, 'mel': mel, 'stop_probs': stop}
        else:
            batch = make_batch(model, b, n_tok, n_frames, rng)
        dbatch = trainer.shard_batch(batch)
        kw = {'r': args.r} if args.model == 'aligner' else {}
        s, aux = trainer.train_step(state, dbatch, **kw)
        state = s
        float(aux['loss'])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, aux = trainer.train_step(s, dbatch, **kw)
        float(aux['loss'])
        dt = (time.perf_counter() - t0) / args.iters
        state = s
        if args.model == 'aligner':
            lowered = trainer._train_step.lower(
                s, dbatch, args.r, False, False, False)
        else:
            lowered = trainer._train_step.lower(s, dbatch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis() or {}
        flops = ca.get('flops', float('nan'))
        byts = ca.get('bytes accessed', float('nan'))
        # XLA's aggregate double-counts (measured eff > 1.0 at bucket 0);
        # fusion-boundary traffic from the ENTRY computation is tighter
        try:
            from scripts.hlo_bytes import (entry_traffic_bytes, op_traffic,
                                           parse_entry_instructions)
            hlo_text = compiled.as_text()
            fb_bytes = entry_traffic_bytes(hlo_text)
            # where do the bytes go: top entry ops + totals per opcode
            instrs = parse_entry_instructions(hlo_text)
            tr = op_traffic(instrs)
            from collections import defaultdict
            by_opcode = defaultdict(float)
            skip = ('parameter', 'constant', 'tuple', 'get-tuple-element',
                    'bitcast')
            for name, info in tr.items():
                if instrs[name]['opcode'] in skip:
                    continue
                by_opcode[info['opcode']] += info['total_bytes']
            print('  traffic by opcode (GB):', {
                k: round(v / 1e9, 2) for k, v in
                sorted(by_opcode.items(), key=lambda kv: -kv[1])[:8]})
            top = sorted(((v['total_bytes'], n, v['opcode'])
                          for n, v in tr.items()
                          if instrs[n]['opcode'] not in skip), reverse=True)
            for byt, name, opc in top[:6]:
                print(f'    {byt / 1e6:9.1f} MB  {opc:<10} {name[:60]}')
        except Exception:
            fb_bytes = float('nan')
        if not np.isfinite(fb_bytes) or fb_bytes <= 0:
            # parser failed: fall back to XLA's aggregate (overcounts, but a
            # labeled verdict beats a NaN one)
            print('  (entry-traffic parse failed; using XLA aggregate bytes)')
            fb_bytes = byts
        t_mxu = flops / (args.peak_tflops * 1e12)
        t_hbm = fb_bytes / (args.peak_gbps * 1e9)
        bound = max(t_mxu, t_hbm)
        kind = 'compute' if t_mxu >= t_hbm else 'memory'
        rows.append({'bucket': f'B{b}x{n_frames}f', 'measured_ms': dt * 1e3,
                     'gflop': flops / 1e9, 'gb': fb_bytes / 1e9,
                     'gb_xla': byts / 1e9,
                     't_mxu_ms': t_mxu * 1e3, 't_hbm_ms': t_hbm * 1e3,
                     'bound': kind, 'efficiency': bound / dt})
        print(f'B{b:>3} x {n_frames:>4}f x {n_tok:>3}t '
              f'{dt * 1e3:8.1f} {flops / 1e9:8.1f} {fb_bytes / 1e9:7.2f} '
              f'{t_mxu * 1e3:7.1f} {t_hbm * 1e3:7.1f} '
              f'{kind + " bound":>12} {bound / dt:6.2f}'
              f'   (xla-agg {byts / 1e9:.1f} GB)')
    import json
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
