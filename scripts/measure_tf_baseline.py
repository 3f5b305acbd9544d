"""Measure the TF2-CPU reference baseline for bench.py's exact workload.

Builds the reference ForwardTransformer at the published LJSpeech scale
(/root/reference/config/training_config.yaml:104-124), wraps the
teacher-forced forward in tf.function (graph mode — the reference's own
train/val steps run this way, model/models.py:442-451), and measures mel
frames/sec on CPU for BOTH workloads:

- B64 x 128 tokens x 768 frames — the workload bench.py measures
  (bench.py:66); this is the primary number written to BENCH_BASELINE.json
  so `vs_baseline` divides like-for-like (VERDICT r2 item 6).
- B32 x 128 tokens x 768 frames — the round-1 measurement point, kept as a
  secondary recorded value.

Usage: python scripts/measure_tf_baseline.py [--write]
    --write  update ../BENCH_BASELINE.json with the measured numbers
"""
import argparse
import json
import sys
import time
import types
from pathlib import Path

import numpy as np


def _stub_reference_deps():
    for name, attrs in [
            ('phonemizer', {}),
            ('phonemizer.phonemize', {'phonemize': lambda text, **k: text}),
            ('ruamel', {}), ('ruamel.yaml', {'YAML': lambda *a, **k: None})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, '/root/reference')


PUBLISHED_CFG = dict(
    encoder_model_dimension=384, decoder_model_dimension=384,
    dropout_rate=0.1,
    decoder_num_heads=[2] * 6, encoder_num_heads=[2] * 6,
    encoder_max_position_encoding=2000, decoder_max_position_encoding=10000,
    encoder_dense_blocks=0, decoder_dense_blocks=0,
    duration_conv_filters=[256, 226], pitch_conv_filters=[256, 226],
    duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
    mel_channels=80, phoneme_language='en-us', with_stress=False,
    model_breathing=True, transposed_attn_convs=True,
    encoder_attention_conv_filters=[1536, 384],
    decoder_attention_conv_filters=[1536, 384],
    encoder_attention_conv_kernel=3, decoder_attention_conv_kernel=3,
    encoder_feed_forward_dimension=None, decoder_feed_forward_dimension=None)


def measure(batch: int, n_tok: int = 128, dur_per_token: int = 6,
            iters: int = 5) -> float:
    """mel frames/sec for the teacher-forced batched forward in graph mode."""
    import tensorflow as tf
    import model.models as ref_models

    model = ref_models.ForwardTransformer(debug=False, **PUBLISHED_CFG)
    rng = np.random.default_rng(0)
    tokens = tf.constant(rng.integers(
        1, model.text_pipeline.tokenizer.vocab_size,
        size=(batch, n_tok), dtype=np.int32))
    durs = tf.constant(
        np.full((batch, n_tok, 1), dur_per_token, np.float32))
    pitch = tf.constant(rng.standard_normal((batch, n_tok, 1)
                                            ).astype(np.float32))

    @tf.function
    def synth(tokens, durs, pitch):
        return model(tokens, durs, target_pitch=pitch, training=False)['mel']

    mel = synth(tokens, durs, pitch)   # trace + compile
    n_frames = int(mel.shape[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        mel = synth(tokens, durs, pitch)
    _ = mel.numpy()
    dt = time.perf_counter() - t0
    fps = batch * n_frames * iters / dt
    print(f'B{batch} N{n_tok} frames{n_frames}: {fps:.1f} mel frames/s '
          f'({dt / iters * 1000:.0f} ms/batch)')
    return fps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--write', action='store_true')
    parser.add_argument('--iters', type=int, default=5)
    args = parser.parse_args()

    _stub_reference_deps()
    fps64 = measure(64, iters=args.iters)
    fps32 = measure(32, iters=args.iters)

    out = {
        'fps': fps64,
        'workload': 'B64 N128 frames768 TF2-CPU graph mode',
        'note': 'reference ForwardTransformer, target durations 6/token; '
                'measured by scripts/measure_tf_baseline.py',
        'secondary': {'fps_b32': fps32,
                      'workload': 'B32 N128 frames768 TF2-CPU graph mode'},
    }
    print(json.dumps(out, indent=1))
    if args.write:
        path = Path(__file__).parent.parent / 'BENCH_BASELINE.json'
        path.write_text(json.dumps(out, indent=1) + '\n')
        print(f'wrote {path}')


if __name__ == '__main__':
    main()
