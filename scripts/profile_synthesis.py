"""Per-op device profile of the batched synthesis forward (bench.py path).

The synthesis roofline (`scripts/roofline_synthesis.py`) says the dispatch is
compute-bound with a 16.9 ms MXU floor but measures 26.3 ms — this breaks the
gap down per HLO fusion (xplane trace + per-op byte annotations) so the
missing milliseconds get names: which fusions are below the matmul roofline
and which memory-bound epilogues serialize with the convs.

    python scripts/profile_synthesis.py [--iters 10] [--top 30]
"""
import argparse
import glob
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--n_tok', type=int, default=128)
    ap.add_argument('--n_frames', type=int, default=768)
    ap.add_argument('--trace_dir', default='/tmp/synth_profile')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--dump', default=None)
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import build_model
    from profile_train_step import collect_device_events

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
    float(jnp.sum(synth_jit(params, tokens)))  # compile + sync

    traffic = {}
    try:
        from hlo_bytes import op_traffic, parse_hlo_instructions
        hlo_text = jax.jit(synth).lower(params, tokens).compile().as_text()
        traffic = op_traffic(parse_hlo_instructions(hlo_text))
        print(f'parsed {len(traffic)} HLO instructions for byte estimates')
    except Exception as exc:
        print(f'HLO byte annotation unavailable: {exc}')

    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        mel = synth_jit(params, tokens)
    float(jnp.sum(mel))
    jax.profiler.stop_trace()

    paths = glob.glob(f'{args.trace_dir}/**/*.xplane.pb', recursive=True)
    if not paths:
        print('ERROR: no xplane.pb produced', file=sys.stderr)
        return 1
    rows = collect_device_events(paths[0])
    per_op = defaultdict(lambda: [0, 0, ''])
    per_cat = defaultdict(int)
    planes = defaultdict(int)
    for name, cat, ps, line, plane in rows:
        planes[(plane, line)] += ps
    print('-- timeline lines ' + '-' * 40)
    for (plane, line), ps in sorted(planes.items(), key=lambda kv: -kv[1]):
        print(f'  {ps / 1e9 / args.iters:9.3f} ms/step  {plane} / {line}')
    sync = [(p, l) for (p, l) in planes if l == 'XLA Ops']
    if sync:
        best_plane, best_line = max(sync, key=lambda k: planes[k])
    else:
        (best_plane, best_line) = max(planes, key=lambda k: planes[k])
    total_ps = 0
    for name, cat, ps, line, plane in rows:
        if (plane, line) != (best_plane, best_line):
            continue
        per_op[name][0] += ps
        per_op[name][1] += 1
        per_op[name][2] = cat
        per_cat[cat or '(none)'] += ps
        total_ps += ps
    if args.dump:
        with open(args.dump, 'w') as f:
            for name, (ps, n, cat) in sorted(per_op.items(),
                                             key=lambda kv: -kv[1][0]):
                f.write(f'{ps}\t{n}\t{cat}\t{name}\n')
        print(f'dumped {len(per_op)} ops to {args.dump}')
    per_step_ms = total_ps / 1e9 / args.iters
    print(f'plane: {best_plane} / line: {best_line}')
    print(f'device busy: {per_step_ms:.2f} ms/dispatch over {args.iters}')
    print(f'\n-- by HLO category {"-" * 40}')
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f'  {cat:<32} {ps / 1e9 / args.iters:8.3f} ms '
              f'{100 * ps / total_ps:5.1f}%')
    print(f'\n-- top {args.top} ops {"-" * 40}')
    from hlo_bytes import match_xplane_name
    for name, (ps, n, cat) in sorted(per_op.items(),
                                     key=lambda kv: -kv[1][0])[:args.top]:
        t = traffic.get(match_xplane_name(name))
        if t is not None and ps:
            per_occ_ps = ps / max(n, 1)
            bw = t['total_bytes'] / (per_occ_ps / 1e12) / 1e9
            extra = f' {t["total_bytes"] / 1e6:7.1f}MB {bw:6.0f}GB/s'
        else:
            extra = ''
        print(f'  {ps / 1e9 / args.iters:8.3f} ms {100 * ps / total_ps:5.1f}% '
              f'x{n // args.iters:<4} [{cat:<20}]{extra} {name[:80]}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
