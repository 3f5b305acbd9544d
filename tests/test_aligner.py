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


# ---------------------------------------------------------------------------
# gradient accumulation (mirrors tests/test_training.py for ForwardTrainer)
# ---------------------------------------------------------------------------

def _dropout_free_aligner():
    m = Aligner(
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=[2], decoder_num_heads=[2],
        encoder_max_position_encoding=200, decoder_max_position_encoding=600,
        encoder_prenet_dimension=32, decoder_prenet_dimension=32,
        dropout_rate=0.0, mel_start_value=0.5, mel_end_value=-0.5,
        mel_channels=MEL, phoneme_language='en-us', with_stress=False,
        decoder_prenet_dropout=0.0, model_breathing=True,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        max_r=10)
    return m


def _uniform_batch(model, b=8, n_tok=12, n_frames=40, seed=5):
    """Every sample has the SAME valid token/frame count, so micro-batch
    loss means equal the full-batch loss and gradients match exactly."""
    rng = np.random.default_rng(seed)
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[:, :10] = rng.integers(1, model.text_pipeline.tokenizer.vocab_size,
                                  size=(b, 10))
    t = n_frames - 2
    mel = np.zeros((b, n_frames, MEL), np.float32)
    stop = np.zeros((b, n_frames), np.int32)
    mel[:, 0] = 0.5
    mel[:, 1:t + 1] = rng.standard_normal((b, t, MEL)).astype(np.float32)
    mel[:, t + 1] = -0.5
    stop[:, :t + 1] = 1
    stop[:, t + 1] = 2
    return {'tokens': tokens, 'mel': mel, 'stop_probs': stop}


def test_aligner_grad_accumulation_matches_single_batch():
    import optax
    model = _dropout_free_aligner()
    mesh = make_mesh(MeshConfig(data=1, model=1),
                     devices=jax.devices('cpu')[:1])
    params = model.init_params(jax.random.PRNGKey(11))
    batch = _uniform_batch(model)

    def run(n):
        # SGD so gradient equality shows up as param equality (Adam's first
        # step amplifies reassociation noise; see the ForwardTrainer test)
        trainer = AlignerTrainer(model, optax.sgd(1e-2), mesh=mesh,
                                 grad_accumulation=n)
        state = trainer.init_state(params=jax.tree_util.tree_map(
            lambda x: x.copy(), params))
        s, aux = trainer.train_step(state, batch, r=2,
                                    force_encoder_diagonal=True,
                                    force_decoder_diagonal=True)
        return s, aux

    s1, aux1 = run(1)
    s2, aux2 = run(4)
    np.testing.assert_allclose(float(aux1['loss']), float(aux2['loss']),
                               rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        gscale = max(float(np.max(np.abs(a))), 1e-6)
        assert float(np.max(np.abs(a - b))) < 1e-3 * gscale


def test_aligner_grad_accumulation_with_attention_aux():
    """return_attention restacks the per-layer maps to full-batch leading
    dim through the scan."""
    import optax
    model = _dropout_free_aligner()
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices('cpu')[:2])
    trainer = AlignerTrainer(model, optax.sgd(1e-2), mesh=mesh,
                             grad_accumulation=2)
    state = trainer.init_state(jax.random.PRNGKey(1))
    batch = _uniform_batch(model, b=8)
    s, aux = trainer.train_step(state, batch, r=2, return_attention=True)
    assert np.isfinite(float(aux['loss']))
    for att in aux['decoder_attention'].values():
        assert att.shape[0] == 8


def test_aligner_grad_accumulation_rejects_indivisible_batch():
    import optax
    model = _dropout_free_aligner()
    mesh = make_mesh(MeshConfig(data=1, model=1),
                     devices=jax.devices('cpu')[:1])
    trainer = AlignerTrainer(model, optax.sgd(1e-2), mesh=mesh,
                             grad_accumulation=3)
    state = trainer.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='divisible'):
        trainer.train_step(state, _uniform_batch(model, b=8), r=2)


def test_bf16_aligner_trains_and_keeps_f32_attention_maps():
    """compute_dtype='bfloat16' is a measured training option (1.6-2.1x
    step speedup, BASELINE.md). Contract: the step runs and the attention
    maps handed to duration extraction stay float32 (exact f32 softmax —
    bf16 enters only through the QK^T matmul; see nn/attention._sdpa)."""
    m = Aligner(
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=[2, 2], decoder_num_heads=[2, 2],
        encoder_max_position_encoding=200,
        decoder_max_position_encoding=600,
        encoder_prenet_dimension=32, decoder_prenet_dimension=32,
        dropout_rate=0.1, mel_start_value=0.5, mel_end_value=-0.5,
        mel_channels=MEL, phoneme_language='en-us', with_stress=False,
        decoder_prenet_dropout=0.1, model_breathing=True,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        max_r=10, compute_dtype='bfloat16')
    m.init_params(jax.random.PRNGKey(0))
    trainer = AlignerTrainer(m, make_optimizer([(0, 1e-4), (100.0, 1e-4)]))
    state = trainer.init_state(params=m.params)
    batch = _fake_batch(m)
    state, aux = trainer.train_step(state, batch, r=2)
    assert np.isfinite(float(aux['loss']))
    # master params stay f32 (bf16 is a compute dtype, not a storage dtype)
    assert all(x.dtype == np.float32
               for x in jax.tree_util.tree_leaves(state.params)
               if np.issubdtype(x.dtype, np.floating))
    val = trainer.val_step(state, batch, r=2)
    attn = val['decoder_attention']['Decoder_LastBlock_CrossAttention']
    assert attn.dtype == np.float32  # duration-extraction input contract
    # rows over real frames sum to 1 (normalized f32 softmax)
    row = np.asarray(attn)[0, :, 1, :].sum(-1)
    np.testing.assert_allclose(row, 1.0, rtol=1e-5)


def test_narrow_pv_default_scoped_to_trainer_traces(aligner):
    """The AlignerTrainer defaults to the narrow-PV attention boundary but
    applies it per-trace: the module global must be False before, during
    (as seen from outside the trace) and after trainer use, so f32 TTS
    paths traced in the same process keep their <1e-4 reference parity.
    The attention maps it returns remain exact normalized f32 softmax."""
    from transformertts_tpu.nn import attention
    assert not attention.F32_NARROW_PV
    mesh = make_mesh(MeshConfig(data=8, model=1),
                     devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = AlignerTrainer(aligner, tx, mesh=mesh)
    assert trainer.narrow_pv  # default ON
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _fake_batch(aligner)
    state, aux = trainer.train_step(state, batch, r=5)
    assert np.isfinite(float(aux['loss']))
    val = trainer.val_step(state, batch, r=5)
    attn = np.asarray(
        val['decoder_attention']['Decoder_LastBlock_CrossAttention'])
    assert attn.dtype == np.float32
    np.testing.assert_allclose(attn[0, :, 1, :].sum(-1), 1.0, rtol=1e-5)
    assert not attention.F32_NARROW_PV  # no leak out of the traces
