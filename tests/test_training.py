"""ForwardTrainer: sharded train/val step over the virtual 8-device mesh."""
import jax
import numpy as np
import pytest

from transformertts_tpu.models.forward_tts import ForwardTransformer
from transformertts_tpu.parallel import MeshConfig, make_mesh
from transformertts_tpu.training import ForwardTrainer, make_optimizer


@pytest.fixture(scope='module')
def tiny_model():
    return ForwardTransformer(
        encoder_model_dimension=64,
        decoder_model_dimension=64,
        dropout_rate=0.1,
        decoder_num_heads=[2],
        encoder_num_heads=[2],
        encoder_max_position_encoding=200,
        decoder_max_position_encoding=400,
        encoder_dense_blocks=1,
        decoder_dense_blocks=1,
        duration_conv_filters=[32, 16],
        pitch_conv_filters=[32, 16],
        duration_kernel_size=3,
        pitch_kernel_size=3,
        predictors_dropout=0.1,
        mel_channels=20,
        phoneme_language='en-us',
        with_stress=False,
        model_breathing=True,
        encoder_feed_forward_dimension=64,
        decoder_feed_forward_dimension=64,
    )


def _fake_batch(model, b=8, n_tok=16, n_frames=64, seed=0):
    rng = np.random.default_rng(seed)
    durations = np.zeros((b, n_tok), np.float32)
    durations[:, :12] = rng.integers(1, 5, size=(b, 12)).astype(np.float32)
    mel = np.zeros((b, n_frames, 20), np.float32)
    for i in range(b):
        t = int(durations[i].sum())
        mel[i, :t] = rng.standard_normal((t, 20)).astype(np.float32)
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[:, :12] = rng.integers(1, model.text_pipeline.tokenizer.vocab_size,
                                  size=(b, 12))
    pitch = np.zeros((b, n_tok), np.float32)
    pitch[:, :12] = rng.standard_normal((b, 12)).astype(np.float32)
    return {'tokens': tokens, 'mel': mel, 'durations': durations, 'pitch': pitch}


def test_train_step_decreases_loss(tiny_model):
    mesh = make_mesh(MeshConfig(data=8, model=1), devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = ForwardTrainer(tiny_model, tx, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _fake_batch(tiny_model)
    losses = []
    for _ in range(8):
        state, aux = trainer.train_step(state, batch)
        losses.append(float(aux['loss']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f'loss did not decrease: {losses}'
    assert int(state.step) == 8


def test_val_step_runs_and_masks(tiny_model):
    mesh = make_mesh(MeshConfig(data=8, model=1), devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = ForwardTrainer(tiny_model, tx, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(1))
    batch = _fake_batch(tiny_model, seed=3)
    aux = trainer.val_step(state, batch)
    assert np.isfinite(float(aux['loss']))
    assert aux['mel_pred'].shape == batch['mel'].shape


def test_batch_padding_to_mesh_multiple(tiny_model):
    """Batches not divisible by the data axis are zero-padded; loss unchanged."""
    mesh = make_mesh(MeshConfig(data=8, model=1), devices=jax.devices('cpu')[:8])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = ForwardTrainer(tiny_model, tx, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    full = _fake_batch(tiny_model, b=8, seed=5)
    aux_full = trainer.val_step(state, full)
    ragged = {k: v[:5] for k, v in full.items()}
    aux_rag = trainer.val_step(state, ragged)
    assert np.isfinite(float(aux_rag['loss']))
    # padded samples contribute nothing: loss equals the 5-sample loss
    only5 = {k: v[:5] for k, v in full.items()}
    np.testing.assert_allclose(float(aux_rag['loss']),
                               float(trainer.val_step(state, only5)['loss']),
                               rtol=1e-6)


def test_log_duration_histograms_batched_rows():
    """fname_durs holds BATCHED (B, N) arrays; the histogram logger must
    iterate per-sample rows (regression: it compared whole rows to 0 and
    the @ignore_exception wrapper swallowed the ValueError silently)."""
    import numpy as np
    import train_tts

    class _Tok:
        idx_to_token = {1: 'a', 2: 'b', 3: ' '}

    class _Pipe:
        tokenizer = _Tok()

    class _Model:
        text_pipeline = _Pipe()

    calls = []

    class _SM:
        def add_histogram(self, tag, values, step):
            calls.append((tag, np.asarray(values), step))

    fname_durs = [(np.asarray([[1, 2, 0], [3, 1, 0]]),
                   np.asarray([[2., 3., 0.], [1., 2., 0.]]),
                   np.asarray([[2.2, 2.8, 0.], [1.1, 2.1, 0.]]))]
    train_tts.log_duration_histograms(_Model(), fname_durs, _SM(), step=5)
    tags = {t for t, _, _ in calls}
    assert 'DurationsTarget/a' in tags and 'DurationsPredicted/a' in tags
    a_target = [v for t, v, _ in calls if t == 'DurationsTarget/a'][0]
    np.testing.assert_allclose(sorted(a_target), [2.0, 2.0])
    b_target = [v for t, v, _ in calls if t == 'DurationsTarget/b'][0]
    np.testing.assert_allclose(b_target, [3.0])


# ---------------------------------------------------------------------------
# gradient accumulation
# ---------------------------------------------------------------------------

def _dropout_free_model():
    return ForwardTransformer(
        encoder_model_dimension=64, decoder_model_dimension=64,
        dropout_rate=0.0, decoder_num_heads=[2], encoder_num_heads=[2],
        encoder_max_position_encoding=200, decoder_max_position_encoding=400,
        encoder_dense_blocks=1, decoder_dense_blocks=1,
        duration_conv_filters=[32, 16], pitch_conv_filters=[32, 16],
        duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.0,
        mel_channels=20, phoneme_language='en-us', with_stress=False,
        model_breathing=True, encoder_feed_forward_dimension=64,
        decoder_feed_forward_dimension=64)


def _uniform_batch(model, b=8, n_tok=16, n_frames=64, seed=3):
    """Every sample has the SAME valid token/frame counts, so the masked-MAE
    mean over any micro-batch split equals the full-batch value and
    accumulated gradients must match the single-batch gradients exactly."""
    rng = np.random.default_rng(seed)
    durations = np.zeros((b, n_tok), np.float32)
    durations[:, :12] = 4.0
    mel = np.zeros((b, n_frames, 20), np.float32)
    mel[:, :48] = rng.standard_normal((b, 48, 20)).astype(np.float32)
    tokens = np.zeros((b, n_tok), np.int32)
    tokens[:, :12] = rng.integers(1, model.text_pipeline.tokenizer.vocab_size,
                                  size=(b, 12))
    pitch = np.zeros((b, n_tok), np.float32)
    pitch[:, :12] = rng.standard_normal((b, 12)).astype(np.float32)
    return {'tokens': tokens, 'mel': mel, 'durations': durations,
            'pitch': pitch}


def test_grad_accumulation_matches_single_batch():
    model = _dropout_free_model()
    mesh = make_mesh(MeshConfig(data=1, model=1),
                     devices=jax.devices('cpu')[:1])
    params = model.init_params(jax.random.PRNGKey(7))
    batch = _uniform_batch(model)

    def run(n):
        # SGD: the update is LINEAR in the gradient, so accumulated-vs-single
        # gradient equality shows up as param equality. (Adam's first step is
        # ~sign(g)*lr — it amplifies float-reassociation noise on near-zero
        # gradients into O(lr) param differences and can't be compared.)
        import optax
        trainer = ForwardTrainer(model, optax.sgd(1e-2), mesh=mesh,
                                 grad_accumulation=n)
        state = trainer.init_state(params=jax.tree_util.tree_map(
            lambda x: x.copy(), params))
        s, aux = trainer.train_step(state, batch)
        return s, aux

    s1, aux1 = run(1)
    s2, aux2 = run(2)
    np.testing.assert_allclose(float(aux1['loss']), float(aux2['loss']),
                               rtol=1e-5)
    # compare the UPDATES against a global scale: per-leaf relative
    # comparison explodes on leaves whose true gradient is zero (wk.bias —
    # softmax is invariant to a constant key shift, so its computed grad is
    # pure cancellation noise)
    d1 = jax.tree_util.tree_map(lambda n, o: np.asarray(n) - np.asarray(o),
                                s1.params, params)
    d2 = jax.tree_util.tree_map(lambda n, o: np.asarray(n) - np.asarray(o),
                                s2.params, params)
    gscale = max(float(np.max(np.abs(x)))
                 for x in jax.tree_util.tree_leaves(d1))
    assert gscale > 0
    for a, b in zip(jax.tree_util.tree_leaves(d1),
                    jax.tree_util.tree_leaves(d2)):
        assert float(np.max(np.abs(a - b))) < 1e-3 * gscale
    # per-sample aux restacked to the full batch
    assert aux2['duration_pred'].shape == aux1['duration_pred'].shape


def test_grad_accumulation_rejects_indivisible_batch():
    model = _dropout_free_model()
    mesh = make_mesh(MeshConfig(data=1, model=1),
                     devices=jax.devices('cpu')[:1])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = ForwardTrainer(model, tx, mesh=mesh, grad_accumulation=3)
    state = trainer.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='divisible'):
        trainer.train_step(state, _uniform_batch(model, b=8))


def test_grad_accumulation_over_mesh():
    """Accumulation composes with data-parallel sharding: the leading dim is
    micro-split inside the jitted step while staying sharded over 'data'."""
    model = _dropout_free_model()
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices('cpu')[:2])
    tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
    trainer = ForwardTrainer(model, tx, mesh=mesh, grad_accumulation=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    s, aux = trainer.train_step(state, _uniform_batch(model, b=8))
    assert np.isfinite(float(aux['loss']))


def test_zero1_moment_sharding_matches_replicated():
    """ZeRO-1 (Adam m/v sharded over 'data', BaseTrainer.state_shardings)
    is a pure layout change: a train step over a DP mesh must produce the
    same params and moments as the replicated layout, up to float
    reassociation noise from the re-ordered reductions."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from transformertts_tpu.parallel import mesh as mesh_lib

    model = _dropout_free_model()
    mesh = make_mesh(MeshConfig(data=4, model=1),
                     devices=jax.devices('cpu')[:4])
    params = model.init_params(jax.random.PRNGKey(7))
    batch = _uniform_batch(model)

    class ReplicatedTrainer(ForwardTrainer):
        def state_shardings(self, state):
            specs = mesh_lib.tp_param_specs(state, self.mesh)  # no zero1
            return jax.tree_util.tree_map(
                lambda sp: NamedSharding(self.mesh, sp), specs,
                is_leaf=lambda x: isinstance(x, P))

    def run(cls):
        tx = make_optimizer([(0, 1e-3), (100, 1e-3)])
        trainer = cls(model, tx, mesh=mesh)
        state = trainer.init_state(params=jax.tree_util.tree_map(
            lambda x: x.copy(), params))
        for seed in range(3):
            state, aux = trainer.train_step(
                state, _uniform_batch(model, seed=seed))
        return trainer, state, aux

    tz, sz, auxz = run(ForwardTrainer)
    tr, sr, auxr = run(ReplicatedTrainer)

    # the ZeRO layout actually shards the moments (and only the moments)
    mom_specs = {str(s.spec) for s in jax.tree_util.tree_leaves(
        tz.state_shardings(sz).opt_state,
        is_leaf=lambda x: hasattr(x, 'spec'))}
    assert any('data' in s for s in mom_specs), mom_specs
    par_specs = {str(s.spec) for s in jax.tree_util.tree_leaves(
        tz.state_shardings(sz).params,
        is_leaf=lambda x: hasattr(x, 'spec'))}
    assert not any('data' in s for s in par_specs), par_specs

    np.testing.assert_allclose(float(auxz['loss']), float(auxr['loss']),
                               rtol=1e-5)
    dz = jax.tree_util.tree_map(lambda n, o: np.asarray(n) - np.asarray(o),
                                sz.params, params)
    gscale = max(float(np.max(np.abs(x)))
                 for x in jax.tree_util.tree_leaves(dz))
    assert gscale > 0
    for a, b in zip(jax.tree_util.tree_leaves(sz.params),
                    jax.tree_util.tree_leaves(sr.params)):
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) \
            < 1e-3 * gscale
