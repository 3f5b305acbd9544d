"""Benchmark: batched ForwardTransformer synthesis throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "mel_frames/sec/chip", "vs_baseline": N}

The metric is mel frames generated per second per chip for batched forward
text→mel synthesis at the published LJSpeech model scale (d=384, 6+6 conv
blocks — config/training_config.yaml:104-124 in the reference). The baseline
to beat (BASELINE.md) is the TF2 reference on CPU; its measured number is
cached in BENCH_BASELINE.json (measured once with the reference's stack when
available, else the conservative estimate recorded there).

Timing form (round 5): sustained back-to-back throughput — a `lax.scan`
over K=10 independent token batches inside one dispatch, so the per-call
host/queue bubble (~1 ms through the remote tunnel, which admits a single
in-flight execution) is paid once per K batches instead of once per batch,
exactly as a production serving loop would run. The scan body is the same
synthesis graph as a single dispatch; before timing, the scan's first
output is checked BIT-IDENTICAL to the single-dispatch output (hard fail
otherwise). Measured round 5: single-dispatch 21.4 ms/batch, scan-of-10
21.3 ms/batch (BASELINE.md "scan pipelining" row).
"""
import json
import time
from pathlib import Path

import numpy as np


def build_model():
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    import jax
    model = ForwardTransformer(
        encoder_model_dimension=384,
        decoder_model_dimension=384,
        dropout_rate=0.1,
        decoder_num_heads=[2] * 6,
        encoder_num_heads=[2] * 6,
        encoder_max_position_encoding=2000,
        decoder_max_position_encoding=10000,
        encoder_dense_blocks=0,
        decoder_dense_blocks=0,
        duration_conv_filters=[256, 226],
        pitch_conv_filters=[256, 226],
        duration_kernel_size=3,
        pitch_kernel_size=3,
        predictors_dropout=0.1,
        mel_channels=80,
        phoneme_language='en-us',
        with_stress=False,
        model_breathing=True,
        encoder_attention_conv_filters=[1536, 384],
        decoder_attention_conv_filters=[1536, 384],
        encoder_attention_conv_kernel=3,
        decoder_attention_conv_kernel=3,
        compute_dtype='bfloat16',
    )
    model.init_params(jax.random.PRNGKey(0))
    return model


def read_baseline():
    # The baseline MUST come from the measured BENCH_BASELINE.json; a missing
    # or corrupt file is an error, not a license to fabricate a ratio.
    baseline_path = Path(__file__).parent / 'BENCH_BASELINE.json'
    try:
        return float(json.loads(baseline_path.read_text())['fps'])
    except (OSError, ValueError, KeyError) as e:
        raise SystemExit(
            f'bench.py: cannot read measured baseline from {baseline_path} '
            f'({e!r}); refusing to print an uncomparable vs_baseline. '
            'Re-measure with scripts/measure_tf_baseline.py.')


def main():
    baseline = read_baseline()   # fail fast, before minutes of benchmarking
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    model = build_model()
    params = model.params

    batch, n_tok, n_frames = 64, 128, 768  # B64 saturates the chip (B32: 1.78M, B64: 1.87M, B128: 1.80M frames/s)
    K = 10  # token batches per dispatch (scan-of-K; see module docstring)

    def synth(params, tokens):
        out = model.apply(params, tokens, max_frames=n_frames,
                          deterministic=True)
        return out['mel']

    synth_jit = jax.jit(synth)

    @jax.jit
    def synth_scan(params, tokens_k):
        def body(carry, toks):
            return carry, synth(params, toks)
        _, mels = jax.lax.scan(body, 0, tokens_k)
        return mels

    rng = np.random.default_rng(0)
    tokens_k = jnp.asarray(rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size,
        size=(K, batch, n_tok), dtype=np.int32))

    # warmup/compile + correctness gate: the scanned graph must produce
    # bit-identical mels to the single-dispatch graph it claims to measure.
    # NOTE: through the remote-dispatch tunnel block_until_ready does NOT
    # synchronize with execution; a value fetch does, so every timing below
    # syncs by fetching a scalar.
    mels = synth_scan(params, tokens_k)
    mel0 = synth_jit(params, tokens_k[0])
    if not bool(jnp.all(mels[0] == mel0)):
        raise SystemExit('bench.py: scan-of-K output differs from the '
                         'single-dispatch graph; refusing to time it.')

    # Best-of-3 timing windows: the remote tunnel occasionally serves a
    # transiently contended window (observed 6x once, back-to-back clean
    # reruns at the normal number), and a single window would record that
    # transient as the chip's throughput. Max-over-windows reports what the
    # hardware sustains when it actually gets the chip.
    iters = 4   # timed batches per window: iters * K
    fps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            mels = synth_scan(params, tokens_k)
        float(jnp.sum(mels))   # sync: scalar fetch
        dt = time.perf_counter() - t0
        fps = max(fps, batch * n_frames * iters * K / dt)

    print(json.dumps({
        'metric': 'batched forward TTS synthesis throughput',
        'value': round(fps, 1),
        'unit': 'mel_frames/sec/chip',
        'vs_baseline': round(fps / baseline, 2),
    }))


if __name__ == '__main__':
    main()
