"""Legacy Keras-2 checkpoint layout: order+shape skeleton round-trip.

Fabricates a legacy ``save_weights``-style hdf5 (top-level ``layer_names``
attr, per-group ``weight_names``) from a known parameter pytree following the
reference's layer/variable creation order, then loads it through the legacy
converter and verifies the pytree round-trips exactly. This validates the
reader + skeleton consistency; the creation-order facts themselves are cited
from the reference source in models/convert.py.
"""
import h5py
import jax
import numpy as np
import pytest

from transformertts_tpu.models import convert
from transformertts_tpu.models.forward_tts import ForwardTransformer
from transformertts_tpu.models.aligner import Aligner
from transformertts_tpu.utils.pytree import flatten_params

FORWARD_CFG = dict(
    encoder_model_dimension=24, decoder_model_dimension=24,
    dropout_rate=0.1, decoder_num_heads=[2, 2], encoder_num_heads=[2, 2],
    encoder_max_position_encoding=100, decoder_max_position_encoding=200,
    encoder_dense_blocks=1, decoder_dense_blocks=1,
    duration_conv_filters=[12, 8], pitch_conv_filters=[12, 8],
    duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
    mel_channels=10, phoneme_language='en-us', with_stress=False,
    model_breathing=False, encoder_attention_conv_filters=[32, 24],
    decoder_attention_conv_filters=[32, 24],
    encoder_attention_conv_kernel=3, decoder_attention_conv_kernel=3,
    encoder_feed_forward_dimension=24, decoder_feed_forward_dimension=24)

ALIGNER_CFG = dict(
    encoder_model_dimension=24, decoder_model_dimension=24,
    encoder_num_heads=[2], decoder_num_heads=[2, 2],
    encoder_max_position_encoding=100, decoder_max_position_encoding=200,
    encoder_prenet_dimension=24, decoder_prenet_dimension=24,
    dropout_rate=0.1, mel_start_value=0.5, mel_end_value=-0.5,
    mel_channels=10, phoneme_language='en-us', with_stress=False,
    decoder_prenet_dropout=0.1, model_breathing=False,
    encoder_feed_forward_dimension=24, decoder_feed_forward_dimension=24,
    max_r=5)

LAYER_NAMES = {
    'forward': ['Embedding', 'Encoder', 'dur_pred', 'expand', 'pitch_pred',
                'dense', 'Decoder', 'dense_1'],
    'aligner': ['Embedding', 'Encoder', 'DecoderPrenet', 'Decoder',
                'FinalProj', 'Postnet'],
}


def _write_legacy_h5(path, skeleton, flat_params, layer_names,
                     skip_shape=()):
    """Emit a legacy-layout h5 whose per-group weight order follows the
    skeleton (i.e. the reference's variable creation order)."""
    with h5py.File(path, 'w') as f:
        f.attrs['layer_names'] = [n.encode() for n in layer_names]
        for lname, paths in zip(layer_names, skeleton):
            g = f.create_group(lname)
            wnames = []
            for i, p in enumerate(paths):
                wname = f'{lname}/w{i}:0'
                if p == '__skip__':
                    g[wname] = np.zeros(skip_shape, np.float32)
                else:
                    g[wname] = np.asarray(flat_params[p])
                wnames.append(wname.encode())
            g.attrs['weight_names'] = wnames


def test_forward_legacy_round_trip(tmp_path):
    model = ForwardTransformer(**FORWARD_CFG)
    params = model.init_params(jax.random.PRNGKey(7))
    flat = flatten_params(params)
    skeleton = convert.forward_legacy_skeleton(model.config)
    # the skeleton must cover every parameter exactly once
    skel_paths = [p for grp in skeleton for p in grp if p != '__skip__']
    assert sorted(skel_paths) == sorted(flat.keys())

    path = tmp_path / 'model_weights.hdf5'
    _write_legacy_h5(path, skeleton, flat, LAYER_NAMES['forward'])
    model2 = ForwardTransformer(**FORWARD_CFG)
    convert.load_reference_weights_into(model2, path)
    flat2 = flatten_params(model2.params)
    assert sorted(flat2.keys()) == sorted(flat.keys())
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat2[k]),
                                      np.asarray(flat[k]), err_msg=k)


def test_aligner_legacy_round_trip(tmp_path):
    model = Aligner(**ALIGNER_CFG)
    params = model.init_params(jax.random.PRNGKey(8))
    flat = flatten_params(params)
    skeleton = convert.aligner_legacy_skeleton(model.config)
    skel_paths = [p for grp in skeleton for p in grp if p != '__skip__']
    assert sorted(skel_paths) == sorted(flat.keys())

    path = tmp_path / 'model_weights.hdf5'
    _write_legacy_h5(path, skeleton, flat, LAYER_NAMES['aligner'])
    model2 = Aligner(**ALIGNER_CFG)
    convert.load_reference_weights_into(model2, path)
    flat2 = flatten_params(model2.params)
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat2[k]),
                                      np.asarray(flat[k]), err_msg=k)


def test_legacy_shape_mismatch_raises(tmp_path):
    model = ForwardTransformer(**FORWARD_CFG)
    params = model.init_params(jax.random.PRNGKey(9))
    flat = flatten_params(params)
    skeleton = convert.forward_legacy_skeleton(model.config)
    # corrupt one weight's shape
    key = 'encoder/dense_0/sarn/mha/wq/kernel'
    flat[key] = np.zeros((3, 3), np.float32)
    path = tmp_path / 'model_weights.hdf5'
    _write_legacy_h5(path, skeleton, flat, LAYER_NAMES['forward'])
    model2 = ForwardTransformer(**FORWARD_CFG)
    with pytest.raises(ValueError, match='shape mismatch'):
        convert.load_reference_weights_into(model2, path)
