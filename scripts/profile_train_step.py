"""Profile the ForwardTransformer training step and break device time down
by HLO category — the evidence base for the MFU roofline (BASELINE.md).

Traces N steps of one bucket with jax.profiler, parses the XSpace proto
(via TF's bundled xplane_pb2 — TF is only imported for the proto), and
prints per-category and per-op device time so "where do the 35 ms go" has
a line-by-line answer.

    python scripts/profile_train_step.py [--bucket 0] [--iters 10] [--model tts]
"""
import argparse
import glob
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def collect_device_events(xspace_path):
    """Return [(op_name, category, total_ps, occurrences)] from the device
    plane of an xplane.pb dump."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(xspace_path, 'rb') as f:
        xspace.ParseFromString(f.read())
    rows = []
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name \
                and 'device' not in plane.name:
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        # every line is collected (with its name) — the caller picks the
        # per-op line ("XLA Ops" on TPU) from the printed timeline summary
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                cat = ''
                for st in ev.stats:
                    if stat_names.get(st.metadata_id) == 'hlo_category':
                        cat = st.str_value or \
                            plane.stat_metadata[st.metadata_id].name
                for st in md.stats:
                    if stat_names.get(st.metadata_id) == 'hlo_category':
                        cat = st.str_value
                rows.append((md.name, cat, ev.duration_ps, line.name,
                             plane.name))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bucket', type=int, default=0)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--model', choices=['tts', 'aligner'], default='tts')
    ap.add_argument('--r', type=int, default=1,
                    help='aligner reduction factor (must match the lowering '
                         'used for byte annotations)')
    ap.add_argument('--trace_dir', default='/tmp/train_profile')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--dump', default=None,
                    help='write all sync-timeline op rows as TSV for '
                         'offline analysis')
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np
    from scripts.measure_train_step import build, build_aligner, make_batch

    if args.model == 'tts':
        model, trainer, state = build()
    else:
        model, trainer, state = build_aligner()
    rng = np.random.default_rng(0)
    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    n_frames, b, n_tok = buckets[args.bucket]
    if args.model == 'tts':
        batch = make_batch(model, b, n_tok, n_frames, rng)
    else:
        vocab = model.text_pipeline.tokenizer.vocab_size
        tokens = np.zeros((b, n_tok), np.int32)
        tokens[:, :int(n_tok * 0.9)] = rng.integers(
            1, vocab, size=(b, int(n_tok * 0.9)))
        mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
        stop = np.ones((b, n_frames), np.int32)
        stop[:, -1] = 2
        batch = {'tokens': tokens, 'mel': mel, 'stop_probs': stop}
    dbatch = trainer.shard_batch(batch)
    step_kw = {'r': args.r} if args.model == 'aligner' else {}
    s, aux = trainer.train_step(state, dbatch, **step_kw)
    float(aux['loss'])  # compile + sync

    # per-instruction bytes from the optimized HLO: lets the top-op table
    # show achieved HBM bandwidth per fusion (scripts/hlo_bytes.py)
    traffic = {}
    try:
        from scripts.hlo_bytes import op_traffic, parse_hlo_instructions
        if args.model == 'aligner':
            # MUST lower at the same r the profiled step runs at, or the
            # xplane op names get matched against a different executable
            lowered = trainer._train_step.lower(s, dbatch, args.r, False,
                                                False, False)
        else:
            lowered = trainer._train_step.lower(s, dbatch)
        hlo_text = lowered.compile().as_text()
        traffic = op_traffic(parse_hlo_instructions(hlo_text))
        print(f'parsed {len(traffic)} HLO instructions for byte estimates')
    except Exception as exc:  # best-effort annotation
        print(f'HLO byte annotation unavailable: {exc}')

    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        s, aux = trainer.train_step(s, dbatch, **step_kw)
    float(aux['loss'])
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
    # the synchronous op timeline is named "XLA Ops"; async DMA lines overlap
    # with it and must not be summed into busy time
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
    print(f'device busy time: {per_step_ms:.2f} ms/step over {args.iters} steps')
    print(f'\n-- by HLO category {"-" * 40}')
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f'  {cat:<32} {ps / 1e9 / args.iters:8.3f} ms '
              f'{100 * ps / total_ps:5.1f}%')
    print(f'\n-- top {args.top} ops {"-" * 40}')
    from scripts.hlo_bytes import match_xplane_name
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
