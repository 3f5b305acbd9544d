"""Legacy Keras-2 checkpoint layout: name-aware conversion.

Fabricates legacy ``save_weights``-style hdf5 files (top-level
``layer_names`` attr, per-group ``weight_names``) with *realistically messy*
Keras auto-names (``dense_17``, global uid counters, bare ``Variable:0``
scalars), then exercises the converter's name-aware matching:

- round-trip with messy names,
- non-trainable Variable (DecoderPrenet.rate) at a *different* position,
- permuted layer group order (same-shaped dur_pred/pitch_pred) matched by
  explicit layer names,
- swapped same-shape wq/wk storage detected via uid monotonicity,
- shape corruption detected via the template shape chain,
- hdf5 export (write_legacy_h5) round-trip through save_model/load_model.
"""
import itertools

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


class _MessyNamer:
    """Keras-style auto-names with a global uid counter shared across the
    whole file, as tf.keras does (first Dense anywhere is 'dense', next is
    'dense_1', ... regardless of parent layer)."""

    _CLASS = {'wq': 'dense', 'wk': 'dense', 'wv': 'dense', 'wo': 'dense',
              'd1': 'dense', 'd2': 'dense', 'linear': 'dense',
              'stop_linear': 'dense', 'mel_out': 'dense',
              'mha': 'multi_head_attention', 'sarn': 'self_attention_res_norm',
              'carn': 'cross_attention_res_norm', 'ffn': 'ffn_res_norm',
              'conv': 'cnn_res_norm', 'conv_blocks': 'cnn_dropout'}

    def __init__(self, counter):
        self.counter = counter
        self.cache = {}

    def _component(self, prefix, part, lname, last_block):
        key = f'{prefix}/{part}'
        if key in self.cache:
            return self.cache[key]
        head, _, idx = part.rpartition('_')
        if idx.isdigit() and head in ('dense', 'conv', 'block'):
            tag = {'dense': 'SADB', 'conv': 'SACB', 'block': 'CADB'}[head]
            if tag == 'CADB' and int(idx) == last_block:
                name = f'{lname}_CADB_last'
            else:
                name = f'{lname}_{tag}_{idx}'
        else:
            base = head if idx.isdigit() else part
            cls = self._CLASS.get(base, self._CLASS.get(part, part))
            n = next(self.counter)
            name = f'{cls}_{n}'
        self.cache[key] = name
        return name

    def name_for(self, lname, path, last_block=-1):
        if path == '__skip__':
            return 'Variable:0'
        parts = path.split('/')
        leaf = parts[-1]
        if leaf == 'pos_encoding_scalar':
            return 'Variable:0'
        if leaf == 'table':
            return f'{lname}/embeddings:0'
        comps = []
        prefix = parts[0]
        for part in parts[1:-1]:
            comps.append(self._component(prefix, part, lname, last_block))
            prefix += '/' + part
        return '/'.join(comps + [leaf]) + ':0'


def _write_messy_h5(path, skeleton, flat_params, layer_names,
                    mutate=None):
    """Legacy-layout h5 with realistic Keras names. ``mutate(lname, items)``
    may reorder/modify the per-group [(wname, array)] list."""
    counter = itertools.count(1)
    namer = _MessyNamer(counter)
    with h5py.File(path, 'w') as f:
        f.attrs['layer_names'] = [n.encode() for n in layer_names]
        for lname, paths in zip(layer_names, skeleton):
            last_block = max(
                (int(p.split('/')[1].rpartition('_')[2])
                 for p in paths if p != '__skip__'
                 and p.split('/')[1].startswith('block_')), default=-1)
            items = []
            for p in paths:
                wname = namer.name_for(lname, p, last_block)
                arr = (np.float32(0.1) if p == '__skip__'
                       else np.asarray(flat_params[p]))
                items.append((wname, arr))
            if mutate is not None:
                items = mutate(lname, items)
            g = f.create_group(lname)
            for wname, arr in items:
                g[wname] = arr
            g.attrs['weight_names'] = [w.encode() for w, _ in items]


def _assert_params_equal(model, flat):
    flat2 = flatten_params(model.params)
    assert sorted(flat2.keys()) == sorted(flat.keys())
    for k in flat:
        np.testing.assert_array_equal(np.asarray(flat2[k]),
                                      np.asarray(flat[k]), err_msg=k)


@pytest.fixture(scope='module')
def forward_setup():
    model = ForwardTransformer(**FORWARD_CFG)
    params = model.init_params(jax.random.PRNGKey(7))
    flat = flatten_params(params)
    skeleton = convert.forward_legacy_skeleton(model.config)
    skel_paths = [p for grp in skeleton for p in grp if p != '__skip__']
    assert sorted(skel_paths) == sorted(flat.keys())
    return flat, skeleton


def test_forward_messy_names_round_trip(tmp_path, forward_setup):
    flat, skeleton = forward_setup
    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['forward'])
    model2 = ForwardTransformer(**FORWARD_CFG)
    convert.load_reference_weights_into(model2, path)
    _assert_params_equal(model2, flat)


def test_forward_permuted_layer_order(tmp_path, forward_setup):
    """dur_pred and pitch_pred have identical shapes here; swapping their
    group order in the file must still map correctly via layer names."""
    flat, skeleton = forward_setup
    order = [0, 1, 4, 3, 2, 5, 6, 7]   # swap dur_pred <-> pitch_pred groups
    lnames = [LAYER_NAMES['forward'][i] for i in order]
    skel = [skeleton[i] for i in order]
    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skel, flat, lnames)
    model2 = ForwardTransformer(**FORWARD_CFG)
    convert.load_reference_weights_into(model2, path)
    _assert_params_equal(model2, flat)


def test_forward_swapped_wq_wk_detected(tmp_path, forward_setup):
    """Same-shape wq/wk stored out of creation order cannot be caught by
    shapes; the uid monotonicity check must refuse to map them silently."""
    flat, skeleton = forward_setup

    def mutate(lname, items):
        if lname != 'Encoder':
            return items
        idx = [k for k, (w, _) in enumerate(items) if w.endswith('kernel:0')]
        i, j = idx[0], idx[2]   # wq.kernel and wk.kernel
        items[i], items[j] = items[j], items[i]
        return items

    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['forward'],
                    mutate=mutate)
    model2 = ForwardTransformer(**FORWARD_CFG)
    with pytest.raises(ValueError, match='creation order'):
        convert.load_reference_weights_into(model2, path)


def test_forward_legacy_shape_mismatch_raises(tmp_path):
    model = ForwardTransformer(**FORWARD_CFG)
    flat = dict(flatten_params(model.init_params(jax.random.PRNGKey(9))))
    skeleton = convert.forward_legacy_skeleton(model.config)
    flat['encoder/dense_0/sarn/mha/wq/kernel'] = np.zeros((3, 3), np.float32)
    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['forward'])
    model2 = ForwardTransformer(**FORWARD_CFG)
    with pytest.raises(ValueError):
        convert.load_reference_weights_into(model2, path)


def test_aligner_messy_names_round_trip(tmp_path):
    model = Aligner(**ALIGNER_CFG)
    params = model.init_params(jax.random.PRNGKey(8))
    flat = flatten_params(params)
    skeleton = convert.aligner_legacy_skeleton(model.config)
    skel_paths = [p for grp in skeleton for p in grp if p != '__skip__']
    assert sorted(skel_paths) == sorted(flat.keys())
    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['aligner'])
    model2 = Aligner(**ALIGNER_CFG)
    convert.load_reference_weights_into(model2, path)
    _assert_params_equal(model2, flat)


def test_aligner_rate_variable_position_robust(tmp_path):
    """The DecoderPrenet rate Variable moved to the FRONT of its group (a
    plausible trainable/non-trainable ordering difference) must not shift
    the d1/d2 kernel mapping."""
    model = Aligner(**ALIGNER_CFG)
    flat = flatten_params(model.init_params(jax.random.PRNGKey(8)))
    skeleton = convert.aligner_legacy_skeleton(model.config)

    def mutate(lname, items):
        if lname == 'DecoderPrenet':
            items = [items[-1]] + items[:-1]   # rate Variable first
        return items

    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['aligner'],
                    mutate=mutate)
    model2 = Aligner(**ALIGNER_CFG)
    convert.load_reference_weights_into(model2, path)
    _assert_params_equal(model2, flat)


def test_save_model_hdf5_round_trip(tmp_path):
    """save_model(weights_format='hdf5') → load_model round-trips exactly
    (the export side of two-way reference interop)."""
    model = ForwardTransformer(**FORWARD_CFG)
    model.init_params(jax.random.PRNGKey(3))
    model.step = 1234
    flat = flatten_params(model.params)
    model.save_model(tmp_path / 'export', weights_format='hdf5')
    assert (tmp_path / 'export' / 'model_weights.hdf5').exists()
    assert not (tmp_path / 'export' / 'model_weights.npz').exists()
    model2 = ForwardTransformer.load_model(tmp_path / 'export')
    assert model2.step == 1234
    _assert_params_equal(model2, flat)


def test_aligner_save_model_hdf5_round_trip(tmp_path):
    model = Aligner(**ALIGNER_CFG)
    model.init_params(jax.random.PRNGKey(4))
    flat = flatten_params(model.params)
    model.save_model(tmp_path / 'export', weights_format='both')
    model2 = Aligner.load_model(tmp_path / 'export')
    _assert_params_equal(model2, flat)
    # the hdf5 alone must also be loadable
    (tmp_path / 'export' / 'model_weights.npz').unlink()
    model3 = Aligner.load_model(tmp_path / 'export')
    _assert_params_equal(model3, flat)


def test_describe_weight_match_signals(tmp_path, forward_setup):
    """describe_weight_match reports WHICH signal carried each layer-group
    assignment (scripts/verify_checkpoint.py's per-layer report): explicit
    names from the layer_names attr where the messy writer kept them,
    order-fallback for anonymous dense groups, named-group for Keras-3."""
    flat, skeleton = forward_setup
    model = ForwardTransformer(**FORWARD_CFG)
    path = tmp_path / 'model_weights.hdf5'
    _write_messy_h5(path, skeleton, flat, LAYER_NAMES['forward'])
    report = convert.describe_weight_match(model, path)
    # 'expand' is weightless, so 7 of the 8 layers carry groups
    assert len(report) == len(LAYER_NAMES['forward']) - 1
    signals = {lname: sig for lname, _, sig in report}
    assert signals['Encoder'] == 'explicit-name'
    assert signals['Decoder'] == 'explicit-name'
    # anonymous Keras default names (dense/dense_1) carry no information;
    # those two slots must be order-fallback
    assert sum(1 for s in signals.values() if s == 'order-fallback') == 2
    roots = {lname: root for lname, root, _ in report}
    assert roots['Encoder'] == 'encoder'

    # Keras-3 layout: group paths ARE the names
    model.init_params(jax.random.PRNGKey(0))
    k3 = tmp_path / 'k3'
    k3.mkdir()
    model.save_model(k3, weights_format='hdf5')
    with h5py.File(k3 / 'model_weights.hdf5', 'a') as f:
        del f.attrs['layer_names']   # make it look like a Keras-3 export
    report3 = convert.describe_weight_match(model, k3 / 'model_weights.hdf5')
    assert all(sig == 'named-group' for _, _, sig in report3)
