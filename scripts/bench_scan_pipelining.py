"""A/B: single-dispatch-per-batch vs lax.scan-of-K-batches synthesis.

Round-5 profiling split the 23.0 ms bench dispatch into 21.1 ms device-busy
+ ~1.9 ms host/queue bubble per dispatch (the axon tunnel admits one
in-flight execution, so the enqueue gap is paid per call —
BASELINE.md round-5 update). A `lax.scan` over K independent token batches
inside ONE dispatch pays that bubble once per K batches instead of once per
batch; the scan body is the identical synthesis graph, so device-busy per
batch is unchanged and the result is the chip's true back-to-back
throughput. This script measures both forms and checks they produce
identical mels.

    python scripts/bench_scan_pipelining.py [--iters 20] [--k 5]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--k', type=int, default=5)
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import bench
    import jax
    import jax.numpy as jnp

    model = bench.build_model()
    params = model.params
    batch, n_tok, n_frames = 64, 128, 768
    K = args.k

    rng = np.random.default_rng(0)
    tokens_k = jnp.asarray(rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size,
        size=(K, batch, n_tok), dtype=np.int32))

    @jax.jit
    def synth_one(params, tokens):
        return model.apply(params, tokens, max_frames=n_frames,
                           deterministic=True)['mel']

    @jax.jit
    def synth_scan(params, tokens_k):
        def body(carry, toks):
            mel = model.apply(params, toks, max_frames=n_frames,
                              deterministic=True)['mel']
            return carry, mel
        _, mels = jax.lax.scan(body, 0, tokens_k)
        return mels

    # correctness: scan output == per-batch outputs
    mels_scan = synth_scan(params, tokens_k)
    mel0 = synth_one(params, tokens_k[0])
    same = bool(jnp.all(mels_scan[0] == mel0))
    print(f'scan[0] == single-dispatch: {same}', flush=True)

    # single-dispatch form (the pre-round-5 bench loop)
    mel = synth_one(params, tokens_k[0])
    float(jnp.sum(mel))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for i in range(K):
            mel = synth_one(params, tokens_k[i % K])
    float(jnp.sum(mel))
    dt1 = (time.perf_counter() - t0) / (args.iters * K)
    print(f'single-dispatch: {dt1 * 1e3:.2f} ms/batch  '
          f'{batch * n_frames / dt1:,.0f} frames/s', flush=True)

    # scan-of-K form
    mels = synth_scan(params, tokens_k)
    float(jnp.sum(mels))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        mels = synth_scan(params, tokens_k)
    float(jnp.sum(mels))
    dtk = (time.perf_counter() - t0) / (args.iters * K)
    print(f'scan-of-{K}:      {dtk * 1e3:.2f} ms/batch  '
          f'{batch * n_frames / dtk:,.0f} frames/s', flush=True)


if __name__ == '__main__':
    main()
