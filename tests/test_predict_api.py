"""Public predict() API knobs (reference README.md:169-177 contract):
speed_regulator, phoneme_max_duration / phoneme_min_duration clamps,
explicit phoneme_durations / phoneme_pitch overrides."""
import jax
import numpy as np
import pytest

from transformertts_tpu.models.forward_tts import ForwardTransformer


@pytest.fixture(scope='module')
def model():
    m = ForwardTransformer(
        encoder_model_dimension=32, decoder_model_dimension=32,
        dropout_rate=0.1, decoder_num_heads=[2], encoder_num_heads=[2],
        encoder_max_position_encoding=400, decoder_max_position_encoding=2000,
        encoder_dense_blocks=1, decoder_dense_blocks=1,
        duration_conv_filters=[16, 8], pitch_conv_filters=[16, 8],
        duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
        mel_channels=12, phoneme_language='en-us', with_stress=False,
        model_breathing=False, encoder_feed_forward_dimension=32,
        decoder_feed_forward_dimension=32)
    m.init_params(jax.random.PRNGKey(3))
    return m


def test_speed_regulator_scales_length(model):
    slow = model.predict('hello out there', speed_regulator=0.5)
    fast = model.predict('hello out there', speed_regulator=2.0)
    # slower speech → more frames (durations divided by the regulator)
    assert slow['mel'].shape[0] > fast['mel'].shape[0]


def test_phoneme_max_duration_caps_frames(model):
    base = model.predict('hello out there')
    capped = model.predict('hello out there',
                           phoneme_max_duration={'h': 1.0, 'e': 1.0,
                                                 'l': 1.0, 'o': 1.0,
                                                 ' ': 1.0, 'u': 1.0,
                                                 't': 1.0, 'r': 1.0})
    assert capped['mel'].shape[0] <= base['mel'].shape[0]


def test_phoneme_min_duration_raises_frames(model):
    tokens = model.text_pipeline.tokenizer('ha')  # known symbols, no G2P
    base = model.predict(tokens, encode=False)
    floored = model.predict(tokens, encode=False,
                            phoneme_min_duration={'h': 20.0, 'a': 20.0})
    assert floored['mel'].shape[0] >= base['mel'].shape[0]
    assert floored['mel'].shape[0] >= 40  # at least the two floored phonemes


def test_explicit_durations_control_output_length(model):
    tokens = model.encode_text('abcd')
    durs = np.full(len(tokens), 5.0, np.float32)
    out = model.predict(tokens, encode=False, phoneme_durations=durs)
    assert out['mel'].shape[0] == 5 * len(tokens)
    # explicit durations ignore the speed regulator (reference semantics)
    out2 = model.predict(tokens, encode=False, phoneme_durations=durs,
                         speed_regulator=2.0)
    assert out2['mel'].shape[0] == out['mel'].shape[0]


def test_explicit_pitch_changes_output(model):
    tokens = model.encode_text('abcd')
    durs = np.full(len(tokens), 4.0, np.float32)
    a = model.predict(tokens, encode=False, phoneme_durations=durs)
    b = model.predict(tokens, encode=False, phoneme_durations=durs,
                      phoneme_pitch=np.full(len(tokens), 3.0, np.float32))
    assert a['mel'].shape == b['mel'].shape
    assert not np.allclose(a['mel'], b['mel'])


def test_reference_usage_snippet_runs(model):
    """The reference README snippet shape: out['mel'].numpy().T must work."""
    out = model.predict('hello')
    mel_t = out['mel'].numpy().T
    assert mel_t.shape[0] == 12


def test_factory_two_level_cache_lookup(model, tmp_path, monkeypatch):
    """tts_ljspeech consults $TRANSFORMERTTS_MODELS_DIR first, then the
    home cache — a model present only in the home cache must load without
    a download attempt even when the env dir is set."""
    name = 'bdf06b9_ljspeech_step_95000'
    home = tmp_path / 'home'
    (home / '.cache' / 'transformertts_tpu' / 'models').mkdir(parents=True)
    model.save_model(home / '.cache' / 'transformertts_tpu' / 'models' / name)
    envdir = tmp_path / 'envdir'
    envdir.mkdir()
    monkeypatch.setenv('HOME', str(home))
    monkeypatch.setenv('TRANSFORMERTTS_MODELS_DIR', str(envdir))
    from transformertts_tpu.models import factory
    loaded = factory.tts_ljspeech('95000')
    assert loaded.mel_channels == model.mel_channels


def test_factory_load_model_dir_noncanonical_h5_name(model, tmp_path):
    """A dir whose weights carry a non-canonical *.hdf5 name still loads
    (delegated to the converter's glob)."""
    d = tmp_path / 'm'
    model.save_model(d, weights_format='both')
    (d / 'model_weights.npz').unlink()
    (d / 'model_weights.hdf5').rename(d / 'forward_step_99.hdf5')
    from transformertts_tpu.models.factory import load_model_dir
    loaded = load_model_dir(d)
    assert loaded.mel_channels == model.mel_channels


def test_apply_platform_env(monkeypatch):
    """JAX_PLATFORMS is re-applied through jax.config (ambient PJRT plugins
    override the env var)."""
    import jax
    from transformertts_tpu.utils.scripts_utils import apply_platform_env
    monkeypatch.setenv('JAX_PLATFORMS', 'cpu')
    apply_platform_env()   # backends already initialized on cpu: no-op OK
    assert jax.devices()[0].platform == 'cpu'


def test_old_config_with_removed_flash_knob_loads(model, tmp_path):
    """Model dirs saved before the use_flash_attention knob was removed
    still load: unknown config keys are absorbed by **kwargs."""
    import yaml
    d = tmp_path / 'old_model'
    model.save_model(d)
    cfg_path = d / 'config.yaml'
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg['use_flash_attention'] = True  # obsolete knob from an old save
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f, allow_unicode=True)
    loaded = ForwardTransformer.load_model(str(d))
    out = loaded.predict("hi", max_frames=40)
    assert np.isfinite(np.asarray(out['mel'])).all()
