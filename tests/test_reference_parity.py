"""Numeric parity vs the reference TF implementation, on identical weights.

Builds the reference models (TF, eager/debug mode) with random init, exports
their weights to hdf5, converts them with models/convert.py, and compares
forward outputs on the same inputs. This is the strongest checkpoint-compat
check available offline (the published LJSpeech artifact uses the same layer
structure).
"""
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

MEL = 20


@pytest.fixture(scope='module')
def reference_modules():
    for name, attrs in [
            ('phonemizer', {}),
            ('phonemizer.phonemize', {'phonemize': lambda text, **k: text}),
            ('ruamel', {}), ('ruamel.yaml', {'YAML': lambda *a, **k: None})]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
    sys.path.insert(0, '/root/reference')
    import model.models as ref_models
    yield ref_models
    sys.path.remove('/root/reference')


FORWARD_CFG = dict(
    encoder_model_dimension=32, decoder_model_dimension=32,
    dropout_rate=0.1, decoder_num_heads=[2, 2], encoder_num_heads=[2, 2],
    encoder_max_position_encoding=200, decoder_max_position_encoding=400,
    encoder_dense_blocks=1, decoder_dense_blocks=1,
    duration_conv_filters=[16, 8], pitch_conv_filters=[16, 8],
    duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
    mel_channels=MEL, phoneme_language='en-us', with_stress=False,
    model_breathing=False, transposed_attn_convs=True,
    encoder_attention_conv_filters=[48, 32],
    decoder_attention_conv_filters=[48, 32],
    encoder_attention_conv_kernel=3, decoder_attention_conv_kernel=3,
    encoder_feed_forward_dimension=32, decoder_feed_forward_dimension=32)


def test_forward_transformer_parity(reference_modules, tmp_path):
    ref = reference_modules.ForwardTransformer(debug=True, **FORWARD_CFG)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size,
                          size=(1, 7), dtype=np.int32)
    durs = rng.integers(1, 4, size=(1, 7, 1)).astype(np.float32)
    pitch = rng.standard_normal((1, 7, 1)).astype(np.float32)

    ref_out = ref(tf.constant(tokens), tf.constant(durs),
                  target_pitch=tf.constant(pitch), training=False)
    wpath = tmp_path / 'ref.weights.h5'
    ref.save_weights(str(wpath))

    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.models.convert import load_reference_weights_into
    mine = ForwardTransformer(**FORWARD_CFG)
    load_reference_weights_into(mine, wpath)
    assert mine.text_pipeline.tokenizer.vocab_size == \
        ref.text_pipeline.tokenizer.vocab_size

    total = int(np.round(durs[0, :, 0]).sum())
    out = mine.apply(mine.params, tokens, max_frames=total,
                     target_durations=durs, target_pitch=pitch,
                     deterministic=True)
    ref_mel = ref_out['mel'].numpy()[0]
    my_mel = np.asarray(out['mel'])[0][:ref_mel.shape[0]]
    mae = np.mean(np.abs(ref_mel - my_mel))
    assert mae < 1e-4, f'mel MAE {mae}'
    np.testing.assert_allclose(np.asarray(out['duration'])[..., 0],
                               ref_out['duration'].numpy()[..., 0],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['pitch'])[..., 0],
                               ref_out['pitch'].numpy()[..., 0], atol=1e-4)


ALIGNER_CFG = dict(
    encoder_model_dimension=32, decoder_model_dimension=32,
    encoder_num_heads=[2], decoder_num_heads=[2, 2],
    encoder_max_position_encoding=200, decoder_max_position_encoding=600,
    encoder_prenet_dimension=32, decoder_prenet_dimension=32,
    dropout_rate=0.1, mel_start_value=0.5, mel_end_value=-0.5,
    mel_channels=MEL, phoneme_language='en-us', with_stress=False,
    decoder_prenet_dropout=0.0, model_breathing=False,
    encoder_feed_forward_dimension=32, decoder_feed_forward_dimension=32,
    max_r=10)


def test_aligner_parity(reference_modules, tmp_path):
    ref = reference_modules.Aligner(debug=True, **ALIGNER_CFG)
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size,
                          size=(1, 6), dtype=np.int32)
    mel = rng.standard_normal((1, 12, MEL)).astype(np.float32)

    ref._set_r(2)
    strided = mel[:, ::2, :]
    # Keras 3 rejects the reference's positional `training` bool inside
    # CrossAttentionBlocks.call, so drive its sublayers with keyword calls
    # (identical math, reference model/models.py:140-160 + layers.py:404-417).
    r = 2
    t_tokens, t_mel = tf.constant(tokens), tf.constant(strided)
    from model.transformer_utils import (create_encoder_padding_mask,
                                         create_look_ahead_mask,
                                         create_mel_padding_mask)
    enc_out, enc_pad_mask, _ = ref._call_encoder(t_tokens, training=False)
    dec_pad = create_mel_padding_mask(t_mel)
    la = create_look_ahead_mask(tf.shape(t_mel)[1])
    combined = tf.maximum(dec_pad, la)
    dec_in = ref.decoder_prenet(t_mel, training=False)
    dec = ref.decoder
    x = dec.layernorm(dec_in)
    seq_len = tf.shape(dec_in)[1]
    x += dec.pos_encoding_scalar * dec.pos_encoding[:, :seq_len * r:r, :]
    ref_attn_last = None
    for block in list(dec.CADB) + [dec.last_CADB]:
        x, _, ref_attn_last = block(
            x, enc_output=enc_out, training=False, look_ahead_mask=combined,
            padding_mask=enc_pad_mask)
    proj = ref.final_proj_mel(x)[:, :, :r * MEL]
    ref_linear = tf.reshape(proj, (1, -1, MEL))
    ref_out = ref.decoder_postnet(ref_linear)
    wpath = tmp_path / 'aligner.weights.h5'
    ref.built = True  # sublayers were built by the manual calls above
    ref.save_weights(str(wpath))

    from transformertts_tpu.models.aligner import Aligner
    from transformertts_tpu.models.convert import load_reference_weights_into
    mine = Aligner(**ALIGNER_CFG)
    load_reference_weights_into(mine, wpath)
    out = mine.apply(mine.params, tokens, strided, r=2, deterministic=True)

    ref_mel = ref_out['mel'].numpy()
    my_mel = np.asarray(out['mel'])
    mae = np.mean(np.abs(ref_mel - my_mel))
    assert mae < 1e-4, f'aligner mel MAE {mae}'
    np.testing.assert_allclose(np.asarray(out['stop_prob']),
                               ref_out['stop_prob'].numpy(), atol=1e-4)
    my_attn = np.asarray(
        out['decoder_attention']['Decoder_LastBlock_CrossAttention'])
    np.testing.assert_allclose(my_attn, ref_attn_last.numpy(), atol=1e-5)


def test_hdf5_export_loads_into_reference_tf(reference_modules, tmp_path):
    """Two-way interop: a model trained here, exported with
    save_model(weights_format='hdf5'), must be consumable by the reference's
    TF ``load_weights`` (legacy layout) and produce the same forward outputs
    (reference model/models.py:600-638)."""
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    import jax

    from transformertts_tpu.models.convert import write_legacy_h5
    mine = ForwardTransformer(**FORWARD_CFG)
    mine.init_params(jax.random.PRNGKey(11))
    export = tmp_path / 'export'
    mine.save_model(export, weights_format='hdf5')
    # this TF is Keras 3, which does not track bare tf.Variables
    # (pos_encoding_scalar/rate); the default export targets the published
    # Keras-2 layout, so re-write without them for this consumer
    write_legacy_h5(mine, export / 'model_weights.hdf5',
                    include_bare_variables=False)

    ref = reference_modules.ForwardTransformer(debug=True, **FORWARD_CFG)
    rng = np.random.default_rng(2)
    tokens = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size,
                          size=(1, 7), dtype=np.int32)
    durs = rng.integers(1, 4, size=(1, 7, 1)).astype(np.float32)
    pitch = rng.standard_normal((1, 7, 1)).astype(np.float32)
    # build the TF variables, then overwrite them from our export
    ref(tf.constant(tokens), tf.constant(durs),
        target_pitch=tf.constant(pitch), training=False)
    ref.load_weights(str(export / 'model_weights.hdf5'))

    ref_out = ref(tf.constant(tokens), tf.constant(durs),
                  target_pitch=tf.constant(pitch), training=False)
    total = int(np.round(durs[0, :, 0]).sum())
    out = mine.apply(mine.params, tokens, max_frames=total,
                     target_durations=durs, target_pitch=pitch,
                     deterministic=True)
    ref_mel = ref_out['mel'].numpy()[0]
    my_mel = np.asarray(out['mel'])[0][:ref_mel.shape[0]]
    mae = np.mean(np.abs(ref_mel - my_mel))
    assert mae < 1e-4, f'mel MAE {mae}'


# ---------------------------------------------------------------------------
# Training-loss parity (VERDICT r2 item 3): identical weights + identical
# batch → the loss SURFACE (not just the forward pass) must match the
# reference to ~1e-5 wherever the semantics coincide, and each side's
# normalization must be pinned by an explicit formula where they deviate
# (documented deviations: transformertts_tpu/training/forward_trainer.py:42-47).
# ---------------------------------------------------------------------------

def _no_padding_forward_batch(ref, seed=3, b=2, n_tok=6):
    """Batch with ZERO padding anywhere: all tokens real, per-row durations
    summing to the same total, every target mel frame nonzero. On such a
    batch the reference's unmasked Keras losses and this repo's masked
    losses provably coincide, so any factor drift is a test failure."""
    rng = np.random.default_rng(seed)
    tokens = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size,
                          size=(b, n_tok), dtype=np.int32)
    durs = rng.integers(1, 4, size=(b, n_tok)).astype(np.float32)
    total = int(durs.sum(axis=1).max())
    for i in range(b):  # equalize row totals so no mel frame is padding
        durs[i, -1] += total - durs[i].sum()
    mel = rng.standard_normal((b, total, MEL)).astype(np.float32) + 0.1
    pitch = rng.standard_normal((b, n_tok)).astype(np.float32)
    return tokens, durs, mel, pitch


def test_forward_training_loss_parity(reference_modules, tmp_path):
    """Reference _val_step losses == forward_loss to 1e-5 on a no-padding
    batch (reference model/models.py:464-516, loss weights [1, 1, 3])."""
    ref = reference_modules.ForwardTransformer(debug=True, **FORWARD_CFG)
    ref._compile(optimizer=tf.keras.optimizers.Adam())
    tokens, durs, mel, pitch = _no_padding_forward_batch(ref)

    ref_out = ref._val_step(tf.constant(tokens), tf.constant(mel),
                            tf.constant(durs), tf.constant(pitch))
    wpath = tmp_path / 'fwd_loss.weights.h5'
    ref.save_weights(str(wpath))

    import jax
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.models.convert import load_reference_weights_into
    from transformertts_tpu.training.forward_trainer import forward_loss
    mine = ForwardTransformer(**FORWARD_CFG)
    load_reference_weights_into(mine, wpath)
    batch = {'tokens': tokens, 'mel': mel, 'durations': durs, 'pitch': pitch}
    total, (losses, _) = forward_loss(mine, mine.params, batch,
                                      jax.random.PRNGKey(0),
                                      deterministic=True)
    for mine_key, ref_key in [('mel', 'mel'), ('duration', 'duration'),
                              ('pitch', 'pitch')]:
        r = float(ref_out['losses'][ref_key])
        m = float(losses[mine_key])
        assert abs(r - m) < 1e-5, f'{mine_key}: ref {r} vs mine {m}'
    assert abs(float(ref_out['loss']) - float(total)) < 3e-5


def test_forward_loss_padded_batch_pins_both_normalizations(
        reference_modules, tmp_path):
    """On a PADDED batch the two implementations deviate by design; pin each
    side's exact formula so any additional drift fails.

    Reference semantics (measured, utils/losses.py:41-49): the `if mask is
    not None` inversion means the 2-arg call from weighted_sum_losses applies
    NO mask — mel MAE averages over every frame including padding, and
    duration/pitch MAE average over every token position. This repo masks
    mel by nonzero target frames and duration/pitch by token padding
    (training/forward_trainer.py:42-54)."""
    ref = reference_modules.ForwardTransformer(debug=True, **FORWARD_CFG)
    ref._compile(optimizer=tf.keras.optimizers.Adam())
    rng = np.random.default_rng(4)
    b, n_tok = 2, 8
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[0, :5] = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size, 5)
    tokens[1, :8] = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size, 8)
    durs = np.zeros((b, n_tok), np.float32)
    durs[0, :5] = rng.integers(1, 4, 5)
    durs[1, :8] = rng.integers(1, 4, 8)
    # mel padded to the batch-max expanded length (as tf.data bucketing
    # produces); row 0's shorter total leaves real padding frames
    frames = int(durs.sum(axis=1).max())
    mel = np.zeros((b, frames, MEL), np.float32)
    for i in range(b):
        t = int(durs[i].sum())
        mel[i, :t] = rng.standard_normal((t, MEL)).astype(np.float32) + 0.1
    pitch = np.zeros((b, n_tok), np.float32)
    pitch[0, :5] = rng.standard_normal(5)
    pitch[1, :8] = rng.standard_normal(8)

    ref_out = ref._val_step(tf.constant(tokens), tf.constant(mel),
                            tf.constant(durs), tf.constant(pitch))
    wpath = tmp_path / 'fwd_pad.weights.h5'
    ref.save_weights(str(wpath))

    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.models.convert import load_reference_weights_into
    from transformertts_tpu.training.forward_trainer import forward_loss
    mine = ForwardTransformer(**FORWARD_CFG)
    load_reference_weights_into(mine, wpath)
    batch = {'tokens': tokens, 'mel': mel, 'durations': durs, 'pitch': pitch}
    total, (losses, out) = forward_loss(mine, mine.params, batch, None,
                                        deterministic=True)

    # the PREDICTIONS agree (forward parity), so both loss formulas below
    # are evaluated on the same surface
    ref_mel = ref_out['mel'].numpy()[:, :frames]
    my_mel = np.asarray(out['mel'])
    assert np.mean(np.abs(ref_mel - my_mel)) < 1e-4

    # reference mel loss == UNMASKED mean over all frames incl. padding
    ref_formula = np.mean(np.abs(mel - ref_mel))
    assert abs(float(ref_out['losses']['mel']) - ref_formula) < 1e-6

    # our mel loss == masked mean over nonzero target frames
    m = (np.abs(mel).sum(-1) > 0).astype(np.float32)
    mine_formula = float((np.abs(mel - my_mel).mean(-1) * m).sum() / m.sum())
    assert abs(float(losses['mel']) - mine_formula) < 1e-6

    # duration/pitch: reference unmasked over b*n_tok, ours over real tokens
    ref_dur = ref_out['duration'].numpy()[..., 0]
    ref_dur_formula = np.mean(np.abs(durs - ref_dur))
    assert abs(float(ref_out['losses']['duration']) - ref_dur_formula) < 1e-6
    tok_m = (tokens > 0).astype(np.float32)
    my_dur = np.asarray(out['duration'])[..., 0]
    mine_dur_formula = float((np.abs(durs - my_dur) * tok_m).sum() / tok_m.sum())
    assert abs(float(losses['duration']) - mine_dur_formula) < 1e-6


def _patch_cross_attention_blocks_keyword_calls():
    """Keras 3 rejects the reference's positional `training` bool when
    CrossAttentionBlocks.call invokes its sub-blocks; re-bind the loop with
    keyword calls (identical math, reference model/layers.py:405-417) so the
    REAL reference _gta_forward loss code can run unmodified."""
    import model.layers as ref_layers
    tf_mod = tf

    def call(self, inputs, enc_output, training, decoder_padding_mask,
             encoder_padding_mask, reduction_factor=1):
        seq_len = tf_mod.shape(inputs)[1]
        x = self.layernorm(inputs)
        x += self.pos_encoding_scalar * self.pos_encoding[
            :, :seq_len * reduction_factor:reduction_factor, :]
        x = self.dropout(x, training=training)
        attention_weights = {}
        for i, block in enumerate(self.CADB):
            x, _, attn_weights = block(
                x, enc_output=enc_output, training=training,
                look_ahead_mask=decoder_padding_mask,
                padding_mask=encoder_padding_mask)
            attention_weights[
                f'{self.name}_DenseBlock{i + 1}_CrossAttention'] = attn_weights
        x, _, attn_weights = self.last_CADB(
            x, enc_output=enc_output, training=training,
            look_ahead_mask=decoder_padding_mask,
            padding_mask=encoder_padding_mask)
        attention_weights[f'{self.name}_LastBlock_CrossAttention'] = attn_weights
        return x, attention_weights

    orig = ref_layers.CrossAttentionBlocks.call
    ref_layers.CrossAttentionBlocks.call = call
    return lambda: setattr(ref_layers.CrossAttentionBlocks, 'call', orig)


def test_aligner_training_loss_parity(reference_modules, tmp_path):
    """Reference _gta_forward losses == aligner_loss to 1e-5 with diagonal
    forcing ON (reference model/models.py:168-211): masked mel MAE, stop CE
    at scaling 8, and the /10-/norm_factor diagonal penalties.

    Batch has no padding (all stop targets nonzero, all mel frames real), so
    the reference's B*T normalizations and this repo's masked/per-real-sample
    normalizations provably coincide — any factor drift fails."""
    restore = _patch_cross_attention_blocks_keyword_calls()
    try:
        ref = reference_modules.Aligner(debug=True, **ALIGNER_CFG)
        ref._set_r(2)
        ref.force_encoder_diagonal = True
        ref.force_decoder_diagonal = True
        ref._compile(stop_scaling=8.0, optimizer=tf.keras.optimizers.Adam())
        rng = np.random.default_rng(5)
        b, n_tok, frames = 2, 6, 13   # tar[:, :-1] → 12 frames, r=2 → 6 steps
        tokens = rng.integers(1, ref.text_pipeline.tokenizer.vocab_size,
                              size=(b, n_tok), dtype=np.int32)
        mel = rng.standard_normal((b, frames, MEL)).astype(np.float32) + 0.1
        stop = np.ones((b, frames), np.int64)
        stop[:, -1] = 2

        ref_out, _ = ref._gta_forward(tf.constant(tokens), tf.constant(mel),
                                      tf.constant(stop), training=False)
        wpath = tmp_path / 'aligner_loss.weights.h5'
        ref.save_weights(str(wpath))

        from transformertts_tpu.models.aligner import Aligner
        from transformertts_tpu.models.convert import load_reference_weights_into
        from transformertts_tpu.training.aligner_trainer import aligner_loss
        from transformertts_tpu.utils.losses import new_scaled_crossentropy
        mine = Aligner(**ALIGNER_CFG)
        load_reference_weights_into(mine, wpath)
        batch = {'tokens': tokens, 'mel': mel, 'stop_probs': stop}
        total, (losses, _) = aligner_loss(
            mine, mine.params, batch, r=2,
            stop_loss=new_scaled_crossentropy(index=2, scaling=8.0),
            force_encoder_diagonal=True, force_decoder_diagonal=True,
            rng=None, deterministic=True)

        for key in ['mel', 'stop_prob', 'diag_loss']:
            r_val = float(ref_out['losses'][key])
            m_val = float(losses[key])
            assert abs(r_val - m_val) < 1e-5, f'{key}: ref {r_val} vs {m_val}'
        assert abs(float(ref_out['loss']) - float(total)) < 3e-5
    finally:
        restore()


def test_stop_ce_padded_normalization_documented(reference_modules):
    """Stop-CE on PADDED stop targets: the reference's Keras reduction
    divides by B*T (total elements — padding inflates the denominator,
    utils/losses.py:4-21 via SUM_OVER_BATCH_SIZE); this repo divides by the
    count of real (nonzero) targets. Pin both formulas."""
    from utils.losses import new_scaled_crossentropy as ref_ce
    from transformertts_tpu.utils.losses import (
        new_scaled_crossentropy as my_ce)
    rng = np.random.default_rng(6)
    b, t = 2, 6
    stop = np.array([[1, 1, 1, 2, 0, 0], [1, 1, 1, 1, 1, 2]], np.int64)
    logits = rng.standard_normal((b, t, 3)).astype(np.float32)

    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ce = -np.take_along_axis(logp, stop[..., None], axis=-1)[..., 0]
    w = (stop > 0).astype(np.float32) + (stop == 2).astype(np.float32) * 7.0

    ref_val = float(ref_ce(index=2, scaling=8.0)(
        tf.constant(stop), tf.constant(logits)))
    assert abs(ref_val - (w * ce).sum() / (b * t)) < 1e-6

    my_val = float(my_ce(index=2, scaling=8.0)(stop, logits))
    assert abs(my_val - (w * ce).sum() / (stop > 0).sum()) < 1e-6
