import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformertts_tpu.models.forward_tts import ForwardTransformer


@pytest.fixture(scope='module')
def tiny_model():
    model = ForwardTransformer(
        encoder_model_dimension=32,
        decoder_model_dimension=32,
        dropout_rate=0.1,
        decoder_num_heads=[2, 2],
        encoder_num_heads=[2, 2],
        encoder_max_position_encoding=200,
        decoder_max_position_encoding=600,
        encoder_dense_blocks=0,
        decoder_dense_blocks=0,
        duration_conv_filters=[16, 16],
        pitch_conv_filters=[16, 16],
        duration_kernel_size=3,
        pitch_kernel_size=3,
        predictors_dropout=0.1,
        mel_channels=20,
        phoneme_language='en-us',
        with_stress=True,
        model_breathing=False,
        transposed_attn_convs=True,
        encoder_attention_conv_filters=[64, 32],
        decoder_attention_conv_filters=[64, 32],
        encoder_attention_conv_kernel=3,
        decoder_attention_conv_kernel=3,
        encoder_feed_forward_dimension=None,
        decoder_feed_forward_dimension=None,
    )
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_training_forward(tiny_model):
    m = tiny_model
    tokens = jnp.array([[5, 8, 9, 3, 0, 0], [5, 8, 9, 3, 2, 7]], jnp.int32)
    tgt_dur = jnp.ones((2, 6, 1), jnp.float32) * 2
    tgt_pitch = jnp.ones((2, 6, 1), jnp.float32)
    out = m.apply(m.params, tokens, max_frames=16,
                  target_durations=tgt_dur, target_pitch=tgt_pitch,
                  rng=jax.random.PRNGKey(1), deterministic=False)
    assert out['mel'].shape == (2, 16, 20)
    assert out['duration'].shape == (2, 6, 1)
    assert out['pitch'].shape == (2, 6, 1)
    # padded tokens produce no frames: sample 0 has 4 real tokens * 2 = 8 frames
    valid0 = 1.0 - np.asarray(out['expanded_mask'])[0, 0, 0]
    assert valid0.sum() == 8
    valid1 = 1.0 - np.asarray(out['expanded_mask'])[1, 0, 0]
    assert valid1.sum() == 12


def test_apply_is_jittable(tiny_model):
    m = tiny_model
    fn = jax.jit(lambda p, t, d, pi: m.apply(
        p, t, max_frames=16, target_durations=d, target_pitch=pi)['mel'])
    tokens = jnp.ones((2, 6), jnp.int32)
    mel = fn(m.params, tokens, jnp.ones((2, 6, 1)) * 2, jnp.ones((2, 6, 1)))
    assert mel.shape == (2, 16, 20)


def test_predict_from_text(tiny_model):
    out = tiny_model.predict('hello world', encode=True)
    assert out['mel'].ndim == 2
    assert out['mel'].shape[1] == 20


def test_predict_speed_regulator(tiny_model):
    # use explicit min duration so predicted durations are nonzero at random init
    slow = tiny_model.predict('test sentence', speed_regulator=0.5,
                              phoneme_min_duration={'t': 4.0})
    fast = tiny_model.predict('test sentence', speed_regulator=2.0,
                              phoneme_min_duration={'t': 4.0})
    assert slow['mel'].shape[0] >= fast['mel'].shape[0]


def test_predict_max_duration_mask(tiny_model):
    # bypass G2P: tokenize the IPA string 'aaaa' directly
    tokens = tiny_model.text_pipeline.tokenizer('aaaa')
    out = tiny_model.predict(tokens, encode=False,
                             phoneme_min_duration={'a': 3.0},
                             phoneme_max_duration={'a': 3.0})
    # every one of the 4 'a' phonemes is clamped to exactly 3 frames
    assert out['mel'].shape[0] == 12


def test_save_load_roundtrip(tiny_model, tmp_path):
    d = tmp_path / 'model_dir'
    tiny_model.save_model(d)
    assert (d / 'config.yaml').exists()
    assert (d / 'model_weights.npz').exists()
    loaded = ForwardTransformer.load_model(d)
    out1 = tiny_model.predict('same text', phoneme_min_duration={'s': 2.0})
    out2 = loaded.predict('same text', phoneme_min_duration={'s': 2.0})
    np.testing.assert_allclose(out1['mel'], out2['mel'], atol=1e-5)


def test_batched_synthesis_matches_per_line(tiny_model):
    """Batched serving path produces the same mels/wav lengths per line."""
    import numpy as np
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models.synthesis import synthesize_lines
    model = tiny_model
    audio = Audio(sampling_rate=22050, n_fft=512, mel_channels=model.mel_channels,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=4)
    lines = ['hello there', 'a much longer sentence with many words in it',
             'short']
    wavs = synthesize_lines(model, audio, lines, n_iter=4)
    assert len(wavs) == 3
    for line, wav in zip(lines, wavs):
        out = model.predict(line)
        expected = out['mel'].shape[0] * audio.hop_length
        assert abs(len(wav) - expected) <= audio.hop_length * 2, \
            (len(wav), expected)


def test_scan_of_k_serving_form_bit_exact(tiny_model):
    """bench.py times a lax.scan over K token batches inside one dispatch
    (the sustained serving form) and refuses to time it unless it is
    bit-identical to the single-dispatch graph. Pin that equality here on
    CPU so a regression is caught before the on-chip bench run
    (bench.py scan-of-K gate; BASELINE.md scan-pipelining row)."""
    m = tiny_model
    K, batch, n_tok, n_frames = 3, 2, 8, 32

    def synth(params, tokens):
        return m.apply(params, tokens, max_frames=n_frames,
                       deterministic=True)['mel']

    synth_jit = jax.jit(synth)

    @jax.jit
    def synth_scan(params, tokens_k):
        def body(carry, toks):
            return carry, synth(params, toks)
        return jax.lax.scan(body, 0, tokens_k)[1]

    rng = np.random.default_rng(0)
    vocab = m.text_pipeline.tokenizer.vocab_size
    tokens_k = jnp.asarray(rng.integers(1, vocab, size=(K, batch, n_tok),
                                        dtype=np.int32))
    mels = synth_scan(m.params, tokens_k)
    assert mels.shape[0] == K
    for k in range(K):
        np.testing.assert_array_equal(
            np.asarray(mels[k]), np.asarray(synth_jit(m.params, tokens_k[k])))


def test_serving_warmup_and_ragged_batches(tiny_model):
    """warmup_serving precompiles the menu; ragged chunk sizes pad to
    power-of-two batch buckets and still return per-line wavs."""
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models import synthesis
    audio = Audio(sampling_rate=22050, n_fft=512,
                  mel_channels=tiny_model.mel_channels,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=4)
    n = synthesis.warmup_serving(
        tiny_model, audio, max_batch=4, token_buckets=(32,),
        frame_buckets=(128,), n_iter=4, include_ragged_batches=True)
    assert n == 3  # batches {4, 1, 2} x 1 token bucket x 1 frame bucket
    # 5 lines at max_batch=4 -> chunks of 4 and 1 (ragged, padded to 1)
    lines = ['one', 'two words here', 'three', 'four words in line', 'five']
    wavs = synthesis.synthesize_lines(tiny_model, audio, lines,
                                      n_iter=4, max_batch=4)
    assert len(wavs) == 5
    for line, wav in zip(lines, wavs):
        assert wav.ndim == 1 and np.all(np.isfinite(wav))
        if len(wav):
            assert np.max(np.abs(wav)) <= 1.0
        expected = tiny_model.predict(line)['mel'].shape[0] * audio.hop_length
        assert abs(len(wav) - expected) <= audio.hop_length * 2, \
            (line, len(wav), expected)


def test_fused_decode_wav_padding_is_silent(tiny_model):
    """Regression: padding frames after the predicted length must be filled
    with the normalizer's silence level before Griffin-Lim — zero-masked
    mel is amplitude 1.0 in normalized log space and previously bled loud
    noise into the padded tail of every serving chunk."""
    from transformertts_tpu.audio import Audio
    audio = Audio(sampling_rate=22050, n_fft=512,
                  mel_channels=tiny_model.mel_channels,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=4)
    tok = np.asarray([tiny_model.encode_text('a few words here')], np.int32)
    features, durations, pitch, keep = tiny_model._encode_jit()(
        tiny_model.params, jnp.asarray(tok))
    totals = int(np.round(np.asarray(durations)[0, :, 0]
                          * np.asarray(keep)[0, :, 0]).sum()) + 1
    frames = 256  # budget far beyond the predicted length
    wav16, mel = tiny_model._decode_wav_jit(audio, 4)(
        tiny_model.params, features, pitch, durations,
        jnp.asarray(np.float32(1.0)), keep, frames)
    mel = np.asarray(mel)
    # padded mel region sits at the silence level, not 0
    silence = float(np.log(audio.normalizer.clip_min))
    np.testing.assert_allclose(mel[0, totals + 2:], silence, atol=1e-3)
    wav = np.asarray(wav16[0]).astype(np.float32) / 32767.0
    tail = wav[(totals + 4) * audio.hop_length:]
    head = wav[: max(totals - 1, 1) * audio.hop_length]
    if len(tail) and np.sqrt(np.mean(head ** 2)) > 1e-4:
        assert np.sqrt(np.mean(tail ** 2)) < 0.05 * np.sqrt(np.mean(head ** 2))


def test_batch_bucket_menu():
    from transformertts_tpu.models.synthesis import _batch_bucket
    assert [_batch_bucket(b, 32) for b in (1, 2, 3, 5, 17, 31, 32, 40)] == \
        [1, 2, 4, 8, 32, 32, 32, 32]
    # a mesh data-axis floor keeps sharded batches divisible
    assert [_batch_bucket(b, 32, min_batch=4) for b in (1, 3, 5, 40)] == \
        [4, 4, 8, 32]


def test_mesh_warmup_serving(tiny_model):
    """warmup_serving over a data mesh precompiles the SPMD executables and
    leaves model.params unmutated."""
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models.synthesis import warmup_serving
    from transformertts_tpu.parallel import MeshConfig, make_mesh
    audio = Audio(sampling_rate=22050, n_fft=512,
                  mel_channels=tiny_model.mel_channels,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=2)
    mesh = make_mesh(MeshConfig(data=2, model=1), devices=jax.devices()[:2])
    before = jax.tree_util.tree_leaves(tiny_model.params)[0]
    n = warmup_serving(tiny_model, audio, max_batch=4, token_buckets=(32,),
                       frame_buckets=(128,), n_iter=2, mesh=mesh,
                       include_ragged_batches=False)
    assert n == 1
    after = jax.tree_util.tree_leaves(tiny_model.params)[0]
    assert before.sharding == after.sharding  # params not re-committed


def test_mesh_sharded_serving_matches_single_device(tiny_model):
    """synthesize_lines over a 4-device data mesh == single-device output."""
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models.synthesis import synthesize_lines
    from transformertts_tpu.parallel import MeshConfig, make_mesh
    audio = Audio(sampling_rate=22050, n_fft=512,
                  mel_channels=tiny_model.mel_channels,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=4)
    lines = ['hello there', 'a much longer sentence with many words in it',
             'short', 'one more line to fill the batch', 'and another',
             'the quick brown fox']
    ref = synthesize_lines(tiny_model, audio, lines, n_iter=4, max_batch=4)
    mesh = make_mesh(MeshConfig(data=4, model=1), devices=jax.devices()[:4])
    got = synthesize_lines(tiny_model, audio, lines, n_iter=4, max_batch=4,
                           mesh=mesh)
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert len(r) == len(g)
        if len(r):
            # SPMD reduction order differs from single-device, and
            # Griffin-Lim on an untrained model's mels amplifies it
            # chaotically near the ±1 clip; compare robustly.
            diff = np.abs(r - g)
            assert np.mean(diff) < 2e-3, np.mean(diff)
            assert np.max(diff) < 0.1, np.max(diff)


def test_predict_wav_single_call(tiny_model):
    from transformertts_tpu.audio import Audio
    audio = Audio(sampling_rate=22050, n_fft=512, mel_channels=20,
                  hop_length=128, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN', griffin_lim_iters=4)
    wav, mel = tiny_model.predict_wav('hello there', audio, max_frames=128)
    assert mel.ndim == 2 and mel.shape[1] == 20
    assert len(wav) == mel.shape[0] * 128
    # agrees with the two-phase path on the shared prefix
    out = tiny_model.predict('hello there')
    n = min(mel.shape[0], out['mel'].shape[0])
    np.testing.assert_allclose(mel[:n], out['mel'][:n], atol=2e-4)
