"""HiFi-GAN vocoder: JAX generator vs a torch reference of the jik876
topology (reduced width), both resblock types, converter fidelity."""
import numpy as np
import pytest

from transformertts_tpu.models.hifigan import HiFiGANVocoder

torch = pytest.importorskip('torch')
nn = torch.nn
F = torch.nn.functional

LRELU_SLOPE = 0.1


def _wn(m):
    return nn.utils.weight_norm(m)


def _get_padding(k, d=1):
    return (k * d - d) // 2


class _ResBlock1(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            _wn(nn.Conv1d(ch, ch, k, 1, dilation=d,
                          padding=_get_padding(k, d))) for d in dilations])
        self.convs2 = nn.ModuleList([
            _wn(nn.Conv1d(ch, ch, k, 1, dilation=1,
                          padding=_get_padding(k, 1))) for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, LRELU_SLOPE))
            xt = c2(F.leaky_relu(xt, LRELU_SLOPE))
            x = xt + x
        return x


class _ResBlock2(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs = nn.ModuleList([
            _wn(nn.Conv1d(ch, ch, k, 1, dilation=d,
                          padding=_get_padding(k, d))) for d in dilations])

    def forward(self, x):
        for c in self.convs:
            x = x + c(F.leaky_relu(x, LRELU_SLOPE))
        return x


class _TorchHiFiGAN(nn.Module):
    def __init__(self, cfg, mel_channels=80):
        super().__init__()
        res = _ResBlock1 if cfg['resblock'] == '1' else _ResBlock2
        ch = cfg['upsample_initial_channel']
        self.num_kernels = len(cfg['resblock_kernel_sizes'])
        self.conv_pre = _wn(nn.Conv1d(mel_channels, ch, 7, 1, padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for u, k in zip(cfg['upsample_rates'], cfg['upsample_kernel_sizes']):
            self.ups.append(_wn(nn.ConvTranspose1d(
                ch, ch // 2, k, u, padding=(k - u) // 2)))
            ch //= 2
            for rk, d in zip(cfg['resblock_kernel_sizes'],
                             cfg['resblock_dilation_sizes']):
                self.resblocks.append(res(ch, rk, d))
        self.conv_post = _wn(nn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, LRELU_SLOPE))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)   # torch default slope 0.01 — deliberate
        return torch.tanh(self.conv_post(x))


SMALL_V1 = {
    'resblock': '1',
    'upsample_rates': [4, 2],
    'upsample_kernel_sizes': [8, 4],
    'upsample_initial_channel': 32,
    'resblock_kernel_sizes': [3, 5],
    'resblock_dilation_sizes': [[1, 3], [1, 3]],
}
SMALL_V2 = {
    'resblock': '2',
    'upsample_rates': [4, 2],
    'upsample_kernel_sizes': [8, 4],
    'upsample_initial_channel': 32,
    'resblock_kernel_sizes': [3],
    'resblock_dilation_sizes': [[1, 3]],
}


@pytest.mark.parametrize('cfg', [SMALL_V1, SMALL_V2], ids=['v1', 'v2'])
def test_forward_matches_torch(cfg):
    torch.manual_seed(0)
    tg = _TorchHiFiGAN(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    jg = HiFiGANVocoder.from_torch_state_dict(sd, config=cfg)
    assert jg.hop_length == 8
    rng = np.random.default_rng(0)
    mel = (rng.standard_normal((2, 80, 29)) - 4.0).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel)).numpy()[:, 0, :]
    out = np.asarray(jg.apply(jg.params, mel.transpose(0, 2, 1)))
    assert out.shape == ref.shape == (2, 29 * 8)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_checkpoint_file_and_inference(tmp_path):
    torch.manual_seed(1)
    tg = _TorchHiFiGAN(SMALL_V1).eval()
    p = tmp_path / 'g_00001000'
    torch.save({'generator': tg.state_dict()}, p)
    jg = HiFiGANVocoder.from_torch_checkpoint(p, config=SMALL_V1)
    rng = np.random.default_rng(1)
    mel = (rng.standard_normal((80, 17)) - 4.0).astype(np.float32)
    wav = jg.inference(mel)
    assert wav.shape == (17 * jg.hop_length,)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel[None])).numpy()[0, 0]
    np.testing.assert_allclose(wav, ref, atol=2e-5)
    with pytest.raises(ValueError):
        jg.inference(np.zeros((12, 5), np.float32))


def test_init_params_full_v1_topology():
    """The published v1 topology initializes and runs (tiny time axis)."""
    import jax
    jg = HiFiGANVocoder()
    params = jg.init_params(jax.random.PRNGKey(0))
    assert jg.hop_length == 256
    mel = np.zeros((1, 3, 80), np.float32)
    wav = jg.apply(params, mel)
    assert wav.shape == (1, 3 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_load_vocoder_autodetect(tmp_path):
    from transformertts_tpu.models.vocoder import load_vocoder
    from transformertts_tpu.models.hifigan import HiFiGANVocoder
    from transformertts_tpu.models.melgan import MelGANVocoder
    import json
    import test_melgan
    torch.manual_seed(2)
    # HiFi-GAN trainer checkpoint + config.json alongside
    tg = _TorchHiFiGAN(SMALL_V2).eval()
    p = tmp_path / 'g_00002000'
    torch.save({'generator': tg.state_dict()}, p)
    (tmp_path / 'config.json').write_text(json.dumps(SMALL_V2))
    v = load_vocoder(p)
    assert isinstance(v, HiFiGANVocoder) and v.resblock_type == '2'
    # MelGAN checkpoint
    mg = test_melgan._TorchGenerator().eval()
    p2 = tmp_path / 'melgan.pt'
    torch.save({'model_g': mg.state_dict()}, p2)
    v2 = load_vocoder(p2)
    assert isinstance(v2, MelGANVocoder)
