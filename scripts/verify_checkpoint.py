"""Verify a (published or custom) reference checkpoint against this framework.

One command to validate the day someone has the real artifact
(`bdf06b9_ljspeech`, reference model/factory.py:10-19 — not downloadable in
this build environment):

    python scripts/verify_checkpoint.py <model_dir>      # config.yaml + hdf5
    python scripts/verify_checkpoint.py <model_dir> --tf # also TF cross-load

It (1) converts the weights, printing a per-layer match report that shows
WHICH signal carried each assignment (explicit-name / order-fallback /
named-group), (2) runs a jitted forward on fixed tokens and prints mel
statistics, and (3) with --tf and TensorFlow installed, loads the same hdf5
into the reference TF implementation and reports the mel MAE between the two
forwards on identical inputs (the <1e-2 north-star check, BASELINE.md).

Drop-in procedure for the published artifact:
    unzip bdf06b9_ljspeech_step_95000.zip -d $TRANSFORMERTTS_MODELS_DIR
    python scripts/verify_checkpoint.py \
        $TRANSFORMERTTS_MODELS_DIR/bdf06b9_ljspeech_step_95000 --tf
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('model_dir', type=Path,
                        help='self-describing model dir (config.yaml + hdf5)')
    parser.add_argument('--tf', action='store_true',
                        help='cross-load into the reference TF model and '
                             'compare forwards (requires tensorflow + '
                             '/root/reference on disk)')
    parser.add_argument('--tokens', type=int, default=12,
                        help='number of fixed test tokens')
    args = parser.parse_args()

    import yaml
    with open(args.model_dir / 'config.yaml') as f:
        config = yaml.safe_load(f)
    weights = sorted(args.model_dir.glob('*.hdf5')) + \
        sorted(args.model_dir.glob('*.h5'))
    if not weights:
        print(f'ERROR: no hdf5 weights under {args.model_dir}')
        return 1
    weights_path = next((w for w in weights
                         if w.name == 'model_weights.hdf5'), weights[0])
    print(f'config:  {args.model_dir / "config.yaml"}')
    print(f'weights: {weights_path}')

    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.models.convert import (describe_weight_match,
                                                   load_reference_weights_into)
    model = ForwardTransformer.from_config(config)

    print('\n-- per-layer match report ' + '-' * 40)
    signals = {}
    for lname, root, signal in describe_weight_match(model, weights_path):
        print(f'  {lname:<28} -> {root:<28} [{signal}]')
        signals[signal] = signals.get(signal, 0) + 1
    print('  signals:', ', '.join(f'{k}×{v}' for k, v in signals.items()))

    load_reference_weights_into(model, weights_path)
    print('\nconversion OK (every assignment shape-verified against the '
          'initialized model)')

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, model.text_pipeline.tokenizer.vocab_size,
                          size=(1, args.tokens), dtype=np.int32)
    durs = np.full((1, args.tokens, 1), 4.0, np.float32)
    pitch = rng.standard_normal((1, args.tokens, 1)).astype(np.float32)
    total = int(durs.sum())
    out = model.apply(model.params, tokens, max_frames=total,
                      target_durations=durs, target_pitch=pitch,
                      deterministic=True)
    mel = np.asarray(out['mel'])
    print('\n-- forward on fixed tokens ' + '-' * 39)
    print(f'  mel shape {mel.shape}  finite={np.isfinite(mel).all()}')
    print(f'  mean {mel.mean():+.4f}  std {mel.std():.4f}  '
          f'min {mel.min():+.4f}  max {mel.max():+.4f}')
    if not np.isfinite(mel).all():
        print('ERROR: non-finite mel output')
        return 1

    if args.tf:
        try:
            mae = tf_crossload_mae(config, weights_path, tokens, durs, pitch,
                                   mel)
        except Exception as e:
            print(f'\nTF cross-load unavailable: {type(e).__name__}: {e}')
            return 1
        print(f'\n-- TF cross-load  mel MAE vs reference forward: {mae:.2e} '
              f'({"OK, < 1e-2" if mae < 1e-2 else "FAIL, >= 1e-2"})')
        return 0 if mae < 1e-2 else 1
    return 0


def _strip_bare_variables(weights_path, out_path):
    """Copy a legacy Keras-2 hdf5 minus the bare-Variable scalars
    (pos_encoding_scalar, DecoderPrenet.rate) that Keras 3 does not track.

    Returns {layer_name: {attr: value}} of what was stripped so the caller
    can assign them onto the rebuilt TF model manually (keeping the
    comparison exact for trained artifacts where the scalar moved off 1.0)."""
    import h5py
    stripped = {}
    with h5py.File(weights_path, 'r') as src, h5py.File(out_path, 'w') as dst:
        for k, v in src.attrs.items():
            dst.attrs[k] = v
        for lname in src:
            g_src, g_dst = src[lname], dst.create_group(lname)
            keep = []
            for wname in [n.decode() if isinstance(n, bytes) else n
                          for n in g_src.attrs.get('weight_names', [])]:
                arr = np.asarray(g_src[wname])
                base = wname.rsplit('/', 1)[-1].split(':')[0]
                if arr.ndim == 0 and base in ('pos_encoding_scalar', 'rate'):
                    stripped.setdefault(lname, {})[base] = float(arr)
                else:
                    g_dst[wname] = arr
                    keep.append(wname.encode())
            g_dst.attrs['weight_names'] = keep
    return stripped


def tf_crossload_mae(config, weights_path, tokens, durs, pitch, my_mel):
    """Load the same hdf5 into the reference TF ForwardTransformer and
    return the mel MAE between the two forwards."""
    import tempfile
    import types
    for name, attrs in [
            ('phonemizer', {}),
            ('phonemizer.phonemize', {'phonemize': lambda text, **k: text}),
            ('ruamel', {}), ('ruamel.yaml', {'YAML': lambda *a, **k: None})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, '/root/reference')
    import tensorflow as tf
    import model.models as ref_models

    keys = ('encoder_model_dimension decoder_model_dimension dropout_rate '
            'decoder_num_heads encoder_num_heads '
            'encoder_max_position_encoding decoder_max_position_encoding '
            'encoder_dense_blocks decoder_dense_blocks '
            'duration_conv_filters pitch_conv_filters duration_kernel_size '
            'pitch_kernel_size predictors_dropout mel_channels '
            'phoneme_language with_stress model_breathing '
            'transposed_attn_convs encoder_attention_conv_filters '
            'decoder_attention_conv_filters encoder_attention_conv_kernel '
            'decoder_attention_conv_kernel encoder_feed_forward_dimension '
            'decoder_feed_forward_dimension').split()
    cfg = {k: config[k] for k in keys if k in config}
    ref = ref_models.ForwardTransformer(debug=True, **cfg)
    ref(tf.constant(tokens), tf.constant(durs),
        target_pitch=tf.constant(pitch), training=False)   # build variables
    try:
        ref.load_weights(str(weights_path))
    except Exception:
        # Keras 3 cannot load the bare tf.Variable scalars Keras 2 wrote
        # (pos_encoding_scalar); strip them into a temp copy and assign
        # their values onto the rebuilt model manually.
        with tempfile.NamedTemporaryFile(suffix='.h5') as tmp:
            stripped = _strip_bare_variables(weights_path, tmp.name)
            ref.load_weights(tmp.name)
        n = 0
        for lname, attrs in stripped.items():
            layer = getattr(ref, {'Encoder': 'encoder',
                                  'Decoder': 'decoder'}.get(lname, lname),
                            None) or ref.get_layer(lname)
            for base, value in attrs.items():
                getattr(layer, base).assign(value)
                n += 1
        print(f'  (Keras-3 fallback: {n} bare scalar(s) stripped from a '
              f'temp copy and assigned manually)')
    ref_out = ref(tf.constant(tokens), tf.constant(durs),
                  target_pitch=tf.constant(pitch), training=False)
    ref_mel = ref_out['mel'].numpy()[0]
    return float(np.mean(np.abs(ref_mel - my_mel[0][:ref_mel.shape[0]])))


if __name__ == '__main__':
    sys.exit(main())
