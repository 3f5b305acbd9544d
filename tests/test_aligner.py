"""Aligner: teacher-forced forward, trainer step, AR predict with KV cache."""
import jax
import numpy as np
import pytest

from transformertts_tpu.models.aligner import Aligner
from transformertts_tpu.parallel import MeshConfig, make_mesh
from transformertts_tpu.training import AlignerTrainer, make_optimizer

MEL = 20


@pytest.fixture(scope='module')
def aligner():
    m = Aligner(
        encoder_model_dimension=32,
        decoder_model_dimension=32,
        encoder_num_heads=[2, 2],
        decoder_num_heads=[2, 2],
        encoder_max_position_encoding=200,
        decoder_max_position_encoding=600,
        encoder_prenet_dimension=32,
        decoder_prenet_dimension=32,
        dropout_rate=0.1,
        mel_start_value=0.5,
        mel_end_value=-0.5,
        mel_channels=MEL,
        phoneme_language='en-us',
        with_stress=False,
        decoder_prenet_dropout=0.1,
        model_breathing=True,
        encoder_feed_forward_dimension=64,
        decoder_feed_forward_dimension=64,
        max_r=10,
    )
    m.init_params(jax.random.PRNGKey(0))
    return m


def _fake_batch(model, b=8, n_tok=12, n_frames=40, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[:, :10] = rng.integers(1, model.text_pipeline.tokenizer.vocab_size,
                                  size=(b, 10))
    mel = np.zeros((b, n_frames, MEL), np.float32)
    stop = np.zeros((b, n_frames), np.int32)
    for i in range(b):
        t = int(rng.integers(20, n_frames - 2))
        mel[i, 0] = 0.5                       # start vector
        mel[i, 1:t + 1] = rng.standard_normal((t, MEL))
        mel[i, t + 1] = -0.5                  # end vector
        stop[i, :t + 1] = 1
        stop[i, t + 1] = 2
    return {'tokens': tokens, 'mel': mel, 'stop_probs': stop}


@pytest.mark.parametrize('r', [1, 5, 10])
def test_teacher_forced_shapes(aligner, r):
    batch = _fake_batch(aligner, b=2)
    strided = batch['mel'][:, :-1][:, ::r]
    out = aligner.apply(aligner.params, batch['tokens'], strided, r,
                        deterministic=True)
    assert out['mel'].shape == (2, strided.shape[1] * r, MEL)
    assert out['stop_prob'].shape[-1] == 3
    assert 'Decoder_LastBlock_CrossAttention' in out['decoder_attention']


def test_train_step_decreases_loss(aligner):
    mesh = make_mesh(MeshConfig(data=8, model=1),
                     devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = AlignerTrainer(aligner, tx, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _fake_batch(aligner)
    losses = []
    for _ in range(6):
        state, aux = trainer.train_step(state, batch, r=5)
        losses.append(float(aux['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_diag_forcing_adds_penalty(aligner):
    mesh = make_mesh(MeshConfig(data=8, model=1),
                     devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = AlignerTrainer(aligner, tx, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _fake_batch(aligner, seed=2)
    aux_plain = trainer.val_step(state, batch, r=5)
    aux_forced = trainer.val_step(state, batch, r=5,
                                  force_encoder_diagonal=True,
                                  force_decoder_diagonal=True)
    assert float(aux_plain['diag_loss']) == 0.0
    assert float(aux_forced['diag_loss']) > 0.0


def test_align_returns_attention(aligner):
    batch = _fake_batch(aligner, b=1, seed=3)
    aligner.set_constants(reduction_factor=1)
    attn, out = aligner.align(batch['tokens'][0], batch['mel'][0],
                              mels_have_start_end_vectors=True)
    # (B, H, mel_t, n_tok)
    assert attn.shape[0] == 1 and attn.shape[-1] == batch['tokens'].shape[1]
    assert np.allclose(attn.sum(-1), 1.0, atol=1e-3)


@pytest.mark.parametrize('r', [1, 5])
def test_predict_runs_and_stops(aligner, r):
    aligner.set_constants(reduction_factor=r)
    out = aligner.predict('hi there', max_length=40)
    assert out['mel'].ndim == 2 and out['mel'].shape[1] == MEL
    assert out['mel'].shape[0] <= (40 // r + 1) * r
    assert out['n_steps'] >= 1


def test_predict_cached_matches_full_decoder(aligner):
    """The KV-cached decode path must agree with the full teacher-forced
    decoder on identical inputs (deterministic, r=1)."""
    aligner.set_constants(reduction_factor=1)
    out = aligner.predict('ab', max_length=12)
    n = out['mel'].shape[0]
    if n < 2:
        pytest.skip('stopped immediately')
    # teacher-force the generated prefix through the full decoder
    tokens = np.asarray(aligner.encode_text('ab'), np.int32)[None, :]
    tar = np.concatenate([np.full((1, 1, MEL), 0.5, np.float32),
                          out['mel'][None, :-1]], axis=1)
    full = aligner.apply(aligner.params, tokens, tar, 1, deterministic=True)
    np.testing.assert_allclose(np.asarray(full['mel'])[0], out['mel'],
                               atol=2e-4)


def test_predict_with_mixed_head_counts():
    """The published aligner uses decoder heads [4,4,4,4,1]; per-block KV
    cache shapes must follow each block's own head count."""
    m = Aligner(
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=[2], decoder_num_heads=[2, 1],
        encoder_max_position_encoding=200, decoder_max_position_encoding=600,
        encoder_prenet_dimension=32, decoder_prenet_dimension=32,
        dropout_rate=0.1, mel_start_value=0.5, mel_end_value=-0.5,
        mel_channels=MEL, phoneme_language='en-us', with_stress=False,
        decoder_prenet_dropout=0.1, model_breathing=True,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        max_r=10)
    m.init_params(jax.random.PRNGKey(4))
    m.set_constants(reduction_factor=1)
    out = m.predict('ab', max_length=16)
    assert out['mel'].shape[1] == MEL
    # cached decode must match the full decoder with mixed heads too
    if out['mel'].shape[0] >= 2:
        tokens = np.asarray(m.encode_text('ab'), np.int32)[None, :]
        tar = np.concatenate([np.full((1, 1, MEL), 0.5, np.float32),
                              out['mel'][None, :-1]], axis=1)
        full = m.apply(m.params, tokens, tar, 1, deterministic=True)
        np.testing.assert_allclose(np.asarray(full['mel'])[0], out['mel'],
                                   atol=2e-4)
