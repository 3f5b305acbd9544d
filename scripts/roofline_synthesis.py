"""Roofline analysis of the batched synthesis forward (the bench.py path).

bench.py's mel frames/s has been flat for three rounds (1.849M → 1.880M →
1.877M) with no stated bound. This applies the training-step roofline method
(`roofline_train_step.py`: XLA cost-analysis FLOPs + entry fusion-boundary
HBM traffic from `hlo_bytes.py`) to the forward synthesis dispatch at the
bench workload — B64 × 128 tokens × 768 frames, published model scale, bf16
compute — and answers: is 1.88M frames/s at the chip's bound, and if not,
where do the missing milliseconds live?

Timing method matches bench.py: N chained dispatches, one scalar fetch to
sync (block_until_ready does not synchronize through the axon tunnel).

    python scripts/roofline_synthesis.py [--iters 20] [--tiny]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--peak_tflops', type=float, default=197.0)
    ap.add_argument('--peak_gbps', type=float, default=819.0)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--n_tok', type=int, default=128)
    ap.add_argument('--n_frames', type=int, default=768)
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes — CPU smoke test of the HLO parsing')
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from bench import build_model

    if args.tiny:
        args.batch, args.n_tok, args.n_frames = 2, 32, 64

    model = build_model()
    params = model.params
    b, n_tok, n_frames = args.batch, args.n_tok, args.n_frames

    def synth(params, tokens):
        out = model.apply(params, tokens, max_frames=n_frames,
                          deterministic=True)
        return out['mel']

    synth_jit = jax.jit(synth)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size,
        size=(b, n_tok), dtype=np.int32))

    float(jnp.sum(synth_jit(params, tokens)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        mel = synth_jit(params, tokens)
    float(jnp.sum(mel))
    dt = (time.perf_counter() - t0) / args.iters
    fps = b * n_frames / dt

    lowered = jax.jit(synth).lower(params, tokens)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    flops = ca.get('flops', float('nan'))
    byts = ca.get('bytes accessed', float('nan'))
    from hlo_bytes import (entry_traffic_bytes, op_traffic,
                           parse_entry_instructions)
    hlo_text = compiled.as_text()
    fb_bytes = entry_traffic_bytes(hlo_text)
    instrs = parse_entry_instructions(hlo_text)
    tr = op_traffic(instrs)
    from collections import defaultdict
    by_opcode = defaultdict(float)
    skip = ('parameter', 'constant', 'tuple', 'get-tuple-element', 'bitcast')
    for name, info in tr.items():
        if instrs[name]['opcode'] in skip:
            continue
        by_opcode[info['opcode']] += info['total_bytes']
    print('traffic by opcode (GB):', {
        k: round(v / 1e9, 3) for k, v in
        sorted(by_opcode.items(), key=lambda kv: -kv[1])[:8]})
    top = sorted(((v['total_bytes'], n, v['opcode'])
                  for n, v in tr.items()
                  if instrs[n]['opcode'] not in skip), reverse=True)
    for byt, name, opc in top[:12]:
        print(f'  {byt / 1e6:9.1f} MB  {opc:<12} {name[:70]}')

    if not np.isfinite(fb_bytes) or fb_bytes <= 0:
        print('(entry-traffic parse failed; using XLA aggregate bytes)')
        fb_bytes = byts
    t_mxu = flops / (args.peak_tflops * 1e12)
    t_hbm = fb_bytes / (args.peak_gbps * 1e9)
    bound = max(t_mxu, t_hbm)
    kind = 'compute' if t_mxu >= t_hbm else 'memory'
    row = {'workload': f'B{b}x{n_tok}t->{n_frames}f',
           'measured_ms': dt * 1e3, 'frames_per_s': fps,
           'gflop': flops / 1e9, 'gb': fb_bytes / 1e9, 'gb_xla': byts / 1e9,
           't_mxu_ms': t_mxu * 1e3, 't_hbm_ms': t_hbm * 1e3,
           'bound': kind, 'efficiency': bound / dt}
    print(f'B{b} x {n_tok}t -> {n_frames}f: {dt * 1e3:.2f} ms/dispatch, '
          f'{fps / 1e6:.3f} M frames/s')
    print(f'  {flops / 1e9:.1f} GFLOP, {fb_bytes / 1e9:.2f} GB entry traffic '
          f'(xla-agg {byts / 1e9:.2f} GB)')
    print(f'  t_mxu {t_mxu * 1e3:.2f} ms, t_hbm {t_hbm * 1e3:.2f} ms -> '
          f'{kind} bound, efficiency vs bound {bound / dt:.2f}')
    print(json.dumps(row))


if __name__ == '__main__':
    main()
