"""MelGAN vocoder: JAX generator vs a torch reference, converter fidelity.

The torch model below mirrors the seungwonpark/melgan generator topology
(the checkpoint family the reference's synthesize_forward_melgan.ipynb
uses), at reduced width so the test stays fast. The JAX side must match the
torch forward to float tolerance after state-dict conversion.
"""
import numpy as np
import pytest

from transformertts_tpu.models.melgan import MelGANVocoder, LOG_MEL_SILENCE

torch = pytest.importorskip('torch')
nn = torch.nn


def _wn(m):
    return nn.utils.weight_norm(m)


class _ResStack(nn.Module):
    def __init__(self, channel):
        super().__init__()
        self.blocks = nn.ModuleList([
            nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(3 ** i),
                _wn(nn.Conv1d(channel, channel, kernel_size=3,
                              dilation=3 ** i)),
                nn.LeakyReLU(0.2),
                _wn(nn.Conv1d(channel, channel, kernel_size=1)),
            ) for i in range(3)
        ])
        self.shortcuts = nn.ModuleList([
            _wn(nn.Conv1d(channel, channel, kernel_size=1))
            for _ in range(3)
        ])

    def forward(self, x):
        for block, shortcut in zip(self.blocks, self.shortcuts):
            x = shortcut(x) + block(x)
        return x


class _TorchGenerator(nn.Module):
    def __init__(self, mel_channels=80, base=64, rates=(8, 2)):
        super().__init__()
        layers = [nn.ReflectionPad1d(3),
                  _wn(nn.Conv1d(mel_channels, base, kernel_size=7))]
        ch = base
        for r in rates:
            layers += [nn.LeakyReLU(0.2),
                       _wn(nn.ConvTranspose1d(ch, ch // 2, kernel_size=2 * r,
                                              stride=r, padding=r // 2)),
                       _ResStack(ch // 2)]
            ch //= 2
        layers += [nn.LeakyReLU(0.2), nn.ReflectionPad1d(3),
                   _wn(nn.Conv1d(ch, 1, kernel_size=7)), nn.Tanh()]
        self.generator = nn.Sequential(*layers)

    def forward(self, mel):
        return self.generator((mel + 5.0) / 5.0)


@pytest.fixture(scope='module')
def pair():
    torch.manual_seed(0)
    tg = _TorchGenerator().eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    jg = MelGANVocoder.from_torch_state_dict(sd)
    return tg, jg


def test_converter_infers_topology(pair):
    _, jg = pair
    assert jg.base_channels == 64
    assert jg.upsample_rates == (8, 2)
    assert jg.hop_length == 16


def test_forward_matches_torch(pair):
    tg, jg = pair
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((2, 80, 37)) - 4.0).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel)).numpy()[:, 0, :]
    out = np.asarray(jg.apply(jg.params, mel.transpose(0, 2, 1)))
    assert out.shape == ref.shape == (2, 37 * 16)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_inference_orientation_and_trim(pair):
    _, jg = pair
    rng = np.random.default_rng(1)
    mel = (rng.standard_normal((80, 25)) - 4.0).astype(np.float32)
    wav = jg.inference(mel)
    # 10 silence frames are appended then 10*hop samples trimmed
    assert wav.shape == (25 * jg.hop_length,)
    assert np.abs(wav).max() <= 1.0
    batched = jg.inference(mel[None])
    np.testing.assert_allclose(batched[0], wav, atol=1e-6)


def test_inference_rejects_wrong_channels(pair):
    _, jg = pair
    with pytest.raises(ValueError):
        jg.inference(np.zeros((40, 10), np.float32))


def test_checkpoint_file_roundtrip(pair, tmp_path):
    tg, jg = pair
    p = tmp_path / 'ckpt.pt'
    torch.save({'model_g': tg.state_dict()}, p)
    jg2 = MelGANVocoder.from_torch_checkpoint(p)
    rng = np.random.default_rng(2)
    mel = (rng.standard_normal((1, 80, 11)) - 4.0).astype(np.float32)
    a = jg.inference(mel)
    b = jg2.inference(mel)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_init_params_shapes():
    jg = MelGANVocoder(base_channels=32, upsample_rates=(2, 2))
    import jax
    params = jg.init_params(jax.random.PRNGKey(0))
    mel = np.full((1, 12, 80), LOG_MEL_SILENCE, np.float32)
    wav = jg.apply(params, mel)
    assert wav.shape == (1, 12 * 4)
    assert np.isfinite(np.asarray(wav)).all()


def test_synthesize_lines_with_vocoder():
    """Batched serving path with a neural vocoder instead of Griffin-Lim
    (the reference's synthesize_forward_melgan.ipynb workflow, batched)."""
    import jax
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.models.synthesis import synthesize_lines
    model = ForwardTransformer(
        encoder_model_dimension=32, decoder_model_dimension=32,
        dropout_rate=0.1, decoder_num_heads=[2], encoder_num_heads=[2],
        encoder_max_position_encoding=400, decoder_max_position_encoding=2000,
        encoder_dense_blocks=1, decoder_dense_blocks=1,
        duration_conv_filters=[16, 8], pitch_conv_filters=[16, 8],
        duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
        mel_channels=16, phoneme_language='en-us', with_stress=False,
        model_breathing=False, encoder_feed_forward_dimension=32,
        decoder_feed_forward_dimension=32)
    model.init_params(jax.random.PRNGKey(0))
    voc = MelGANVocoder(mel_channels=16, base_channels=16,
                        upsample_rates=(2, 2))
    voc.init_params(jax.random.PRNGKey(1))
    audio = Audio(sampling_rate=22050, n_fft=512, mel_channels=16,
                  hop_length=4, win_length=512, f_min=0, f_max=8000,
                  normalizer='MelGAN')
    lines = ['hello there', 'a second longer line of text']
    wavs = synthesize_lines(model, audio, lines, vocoder=voc)
    assert len(wavs) == 2
    for line, wav in zip(lines, wavs):
        out = model.predict(line)
        expected = out['mel'].shape[0] * voc.hop_length
        assert abs(len(wav) - expected) <= voc.hop_length * 2
        assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
