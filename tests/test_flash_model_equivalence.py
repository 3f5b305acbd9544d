"""Flash-enabled ForwardTransformer must match the standard path."""
import jax
import numpy as np
import pytest

from transformertts_tpu.models.forward_tts import ForwardTransformer

CFG = dict(
    encoder_model_dimension=32, decoder_model_dimension=32,
    dropout_rate=0.1, decoder_num_heads=[2], encoder_num_heads=[2],
    encoder_max_position_encoding=200, decoder_max_position_encoding=400,
    encoder_dense_blocks=1, decoder_dense_blocks=1,
    duration_conv_filters=[16, 8], pitch_conv_filters=[16, 8],
    duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
    mel_channels=12, phoneme_language='en-us', with_stress=False,
    model_breathing=False, encoder_feed_forward_dimension=32,
    decoder_feed_forward_dimension=32)


def test_flash_matches_standard_forward():
    m_std = ForwardTransformer(**CFG)
    params = m_std.init_params(jax.random.PRNGKey(0))
    m_flash = ForwardTransformer(use_flash_attention=True, **CFG)
    m_flash.params = params

    rng = np.random.default_rng(0)
    tokens = np.zeros((2, 9), np.int32)
    tokens[:, :7] = rng.integers(1, 50, size=(2, 7))
    durs = np.zeros((2, 9, 1), np.float32)
    durs[:, :7, 0] = rng.integers(1, 4, size=(2, 7))
    pitch = rng.standard_normal((2, 9, 1)).astype(np.float32)

    out_std = m_std.apply(params, tokens, max_frames=32,
                          target_durations=durs, target_pitch=pitch,
                          deterministic=True)
    out_flash = m_flash.apply(params, tokens, max_frames=32,
                              target_durations=durs, target_pitch=pitch,
                              deterministic=True)
    np.testing.assert_allclose(np.asarray(out_flash['mel']),
                               np.asarray(out_std['mel']), atol=2e-4)
    # flash path does not materialize attention maps
    assert all(w is None
               for w in out_flash['encoder_attention'].values())
