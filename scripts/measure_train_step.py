"""Measure ForwardTransformer training step time + achieved FLOP/s on the
attached chip, at the published LJSpeech model scale, across representative
length buckets.

Prints one line per bucket: step wall time (post-warmup, synced by scalar
fetch — block_until_ready does not synchronize through the remote tunnel),
the XLA cost-analysis FLOPs of the compiled step, and the achieved TFLOP/s
(divide by your chip's peak for MFU). Run on the real TPU:

    python scripts/measure_train_step.py [--iters 20]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_aligner(compute_dtype: str = 'float32'):
    """Published-scale Aligner (config/training_config.yaml aligner_settings)."""
    from transformertts_tpu.models.aligner import Aligner
    from transformertts_tpu.training import AlignerTrainer, make_optimizer
    import jax
    model = Aligner(
        compute_dtype=compute_dtype,
        encoder_model_dimension=256, decoder_model_dimension=256,
        encoder_num_heads=[4, 4, 4, 4], decoder_num_heads=[4, 4, 4, 4, 1],
        encoder_feed_forward_dimension=512, decoder_feed_forward_dimension=512,
        encoder_prenet_dimension=256, decoder_prenet_dimension=256,
        encoder_max_position_encoding=10000,
        decoder_max_position_encoding=10000,
        dropout_rate=0.1, decoder_prenet_dropout=0.1, mel_channels=80,
        max_r=10, stop_loss_scaling=8, phoneme_language='en-us',
        with_stress=True, model_breathing=False,
        mel_start_value=0.5, mel_end_value=-0.5)
    tx = make_optimizer([(0.0, 1e-4), (1000.0, 1e-4)])
    trainer = AlignerTrainer(model, tx)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return model, trainer, state


def build(grad_accumulation: int = 1):
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.training import ForwardTrainer, make_optimizer
    import jax
    model = ForwardTransformer(
        encoder_model_dimension=384, decoder_model_dimension=384,
        dropout_rate=0.1, decoder_num_heads=[2] * 6, encoder_num_heads=[2] * 6,
        encoder_max_position_encoding=2000,
        decoder_max_position_encoding=10000,
        encoder_dense_blocks=0, decoder_dense_blocks=0,
        duration_conv_filters=[256, 226], pitch_conv_filters=[256, 226],
        duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
        mel_channels=80, phoneme_language='en-us', with_stress=False,
        model_breathing=True,
        encoder_attention_conv_filters=[1536, 384],
        decoder_attention_conv_filters=[1536, 384],
        encoder_attention_conv_kernel=3, decoder_attention_conv_kernel=3,
        compute_dtype='bfloat16')
    tx = make_optimizer([(0.0, 1e-4), (1000.0, 1e-4)])
    trainer = ForwardTrainer(model, tx, grad_accumulation=grad_accumulation)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return model, trainer, state


def make_batch(model, b, n_tok, n_frames, rng):
    tokens = np.zeros((b, n_tok), np.int32)
    durations = np.zeros((b, n_tok), np.float32)
    n_used = max(4, int(n_tok * 0.9))
    tokens[:, :n_used] = rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size, size=(b, n_used))
    per = n_frames // n_used
    durations[:, :n_used] = per
    durations[:, n_used - 1] += n_frames - per * n_used
    mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
    pitch = rng.standard_normal((b, n_tok)).astype(np.float32)
    return {'tokens': tokens, 'mel': mel,
            'durations': durations, 'pitch': pitch}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--model', choices=['tts', 'aligner'], default='tts')
    ap.add_argument('--r', type=int, default=1,
                    help='aligner reduction factor (static jit arg)')
    ap.add_argument('--dtype', choices=['float32', 'bfloat16'],
                    default='float32',
                    help='aligner only: compute dtype (the TTS build is '
                         'always bf16; the aligner default is f32 — its '
                         'attention maps feed duration extraction)')
    ap.add_argument('--grad_accumulation', type=int, default=1,
                    help='tts only: micro-batches per optimizer step; the '
                         'printed per-step time covers ALL N micro-batches')
    ap.add_argument('--bucket', type=int, default=None,
                    help='measure only this bucket index (one shape per '
                         'process gives the cleanest timing — compiling '
                         'several shapes in one process degrades later '
                         'measurements on remote-dispatch backends)')
    args = ap.parse_args()
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if args.model == 'aligner':
        return main_aligner(args)
    model, trainer, state = build(args.grad_accumulation)
    rng = np.random.default_rng(0)
    # (bucket frames, batch) pairs from the published bucket config
    # (config/training_config.yaml bucket_boundaries / bucket_batch_sizes)
    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    if args.bucket is not None:
        buckets = [buckets[args.bucket]]
    print(f'{"bucket":>22} {"device ms":>10} {"host-fed ms":>12} '
          f'{"GFLOP/step":>11} {"TFLOP/s":>8} {"frames/s":>10}')
    for n_frames, b, n_tok in buckets:
        # under accumulation the MICRO-batch is the bucket size; the fed
        # batch is N x that, so per-micro compute matches the N=1 bucket
        b = b * args.grad_accumulation
        batch = make_batch(model, b, n_tok, n_frames, rng)
        dbatch = trainer.shard_batch(batch)  # device-resident copy
        # warmup/compile (NOTE: train_step donates its input state — never
        # reuse a state that has been passed in; always chain the returns)
        s, aux = trainer.train_step(state, dbatch)
        state = s
        float(aux['loss'])  # sync
        # (a) device compute: batch pre-staged, back-to-back chained steps
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, aux = trainer.train_step(s, dbatch)
        float(aux['loss'])  # sync by scalar fetch
        dt_dev = (time.perf_counter() - t0) / args.iters
        # (b) end-to-end with a fresh host numpy batch fed every step (what
        # a real training loop pays; through a remote tunnel this is
        # transfer-dominated and noisy)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, aux = trainer.train_step(s, batch)
        float(aux['loss'])
        dt_host = (time.perf_counter() - t0) / args.iters
        state = s
        # cost analysis AFTER timing: .lower().compile() issues heavy
        # synchronous compile RPCs that would otherwise pollute the loop
        ca = trainer._train_step.lower(s, dbatch).compile().cost_analysis()
        flops = (ca or {}).get('flops', float('nan'))
        tfps = flops / dt_dev / 1e12
        print(f'B{b:>3} x {n_frames:>4}f x {n_tok:>3}t '
              f'{dt_dev * 1e3:10.1f} {dt_host * 1e3:12.1f} '
              f'{flops / 1e9:11.1f} {tfps:8.1f} '
              f'{b * n_frames / dt_dev:10.0f}')


def main_aligner(args):
    import jax
    model, trainer, state = build_aligner(compute_dtype=args.dtype)
    rng = np.random.default_rng(0)
    vocab = model.text_pipeline.tokenizer.vocab_size
    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    if args.bucket is not None:
        buckets = [buckets[args.bucket]]
    r = args.r
    print(f'aligner, r={r}')
    print(f'{"bucket":>22} {"device ms":>10} {"GFLOP/step":>11} '
          f'{"TFLOP/s":>8} {"frames/s":>10}')
    for n_frames, b, n_tok in buckets:
        tokens = np.zeros((b, n_tok), np.int32)
        tokens[:, :int(n_tok * 0.9)] = rng.integers(
            1, vocab, size=(b, int(n_tok * 0.9)))
        mel = rng.standard_normal((b, n_frames, 80)).astype(np.float32)
        stop = np.ones((b, n_frames), np.int32)
        stop[:, -1] = 2
        batch = {'tokens': tokens, 'mel': mel, 'stop_probs': stop}
        dbatch = trainer.shard_batch(batch)
        s, aux = trainer.train_step(state, dbatch, r=r)
        state = s
        float(aux['loss'])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, aux = trainer.train_step(s, dbatch, r=r)
        float(aux['loss'])
        dt = (time.perf_counter() - t0) / args.iters
        state = s
        ca = trainer._train_step.lower(
            s, dbatch, r, False, False, False).compile().cost_analysis()
        flops = (ca or {}).get('flops', float('nan'))
        print(f'B{b:>3} x {n_frames:>4}f x {n_tok:>3}t '
              f'{dt * 1e3:10.1f} {flops / 1e9:11.1f} '
              f'{flops / dt / 1e12:8.1f} {b * n_frames / dt:10.0f}')


if __name__ == '__main__':
    main()
