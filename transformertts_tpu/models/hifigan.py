"""HiFi-GAN vocoder: JAX/TPU-native generator + torch-checkpoint converter.

The reference's pretrained LJSpeech models are advertised as compatible with
the ``jik876/hifi-gan`` vocoder (`/root/reference/README.md:19-22`). This
module re-implements that generator in JAX so HiFi-GAN checkpoints
synthesize on TPU: conv_pre → [LeakyReLU(0.1) → transposed-conv upsample →
multi-receptive-field fusion (average of N resblocks)] per stage →
LeakyReLU(default 0.01 — torch's ``F.leaky_relu`` default, a deliberate
asymmetry in the original code) → conv_post → tanh. Supports both resblock
types ("1": two convs per dilation with dilated+unit pairs; "2": one dilated
conv per dilation), topology taken from the checkpoint's ``config.json``
dict (v1 defaults built in). All convs are zero-padded (HiFi-GAN uses no
reflection padding), weight norm is folded at conversion.

Input is the same MelGAN-style normalized log-mel (ln, clip 1e-5) the
reference's models emit; orientation matches the torch repo: ``inference``
takes (mel_channels, T) or (B, mel_channels, T).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from transformertts_tpu.models.melgan import _folded, _conv1d, \
    _conv_transpose1d, _conv_init

LRELU_SLOPE = 0.1

V1_CONFIG = {
    'resblock': '1',
    'upsample_rates': [8, 8, 2, 2],
    'upsample_kernel_sizes': [16, 16, 4, 4],
    'upsample_initial_channel': 512,
    'resblock_kernel_sizes': [3, 7, 11],
    'resblock_dilation_sizes': [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
}


def _leaky(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


def _pad_conv(x, p, k: int, dilation: int = 1):
    pad = (k * dilation - dilation) // 2
    y = lax.conv_general_dilated(
        x, p['w'], window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,), dimension_numbers=('NHC', 'HIO', 'NHC'))
    return y + p['b']


class HiFiGANVocoder:
    """Functional HiFi-GAN generator; ``apply``/``inference`` are pure and
    jittable, params live in ``self.params``."""

    def __init__(self, mel_channels: int = 80, config: dict = None):
        cfg = dict(V1_CONFIG)
        cfg.update(config or {})
        self.mel_channels = mel_channels
        self.resblock_type = str(cfg['resblock'])
        self.upsample_rates = list(cfg['upsample_rates'])
        self.upsample_kernel_sizes = list(cfg['upsample_kernel_sizes'])
        self.initial_channel = int(cfg['upsample_initial_channel'])
        self.resblock_kernel_sizes = list(cfg['resblock_kernel_sizes'])
        self.resblock_dilation_sizes = [list(d) for d in
                                        cfg['resblock_dilation_sizes']]
        self.hop_length = int(np.prod(self.upsample_rates))
        self.params = None
        self._jit_cache = {}

    def cache_key(self) -> tuple:
        """Static-architecture key: two HiFiGAN objects with equal keys have
        identical ``apply`` semantics (params are call arguments), so jitted
        executables can be shared instead of keyed on object identity."""
        return ('HiFiGAN', self.mel_channels, self.resblock_type,
                tuple(self.upsample_rates),
                tuple(self.upsample_kernel_sizes), self.initial_channel,
                tuple(self.resblock_kernel_sizes),
                tuple(tuple(d) for d in self.resblock_dilation_sizes))

    # ---------------------------------------------------------------- init

    def init_params(self, rng) -> dict:
        ch = self.initial_channel
        rng, sub = jax.random.split(rng)
        params = {'conv_pre': _conv_init(sub, self.mel_channels, ch, 7),
                  'ups': [], 'resblocks': []}
        for u, k in zip(self.upsample_rates, self.upsample_kernel_sizes):
            rng, sub = jax.random.split(rng)
            params['ups'].append(_conv_init(sub, ch, ch // 2, k))
            ch //= 2
            for rk, dils in zip(self.resblock_kernel_sizes,
                                self.resblock_dilation_sizes):
                convs1, convs2 = [], []
                for d in dils:
                    rng, r1, r2 = jax.random.split(rng, 3)
                    convs1.append(_conv_init(r1, ch, ch, rk))
                    if self.resblock_type == '1':
                        convs2.append(_conv_init(r2, ch, ch, rk))
                params['resblocks'].append({'convs1': convs1,
                                            'convs2': convs2})
        rng, sub = jax.random.split(rng)
        params['conv_post'] = _conv_init(sub, ch, 1, 7)
        self.params = params
        return params

    # --------------------------------------------------------------- apply

    def _resblock(self, params, x, kernel: int, dilations: Sequence[int]):
        if self.resblock_type == '1':
            for c1, c2, d in zip(params['convs1'], params['convs2'],
                                 dilations):
                xt = _pad_conv(_leaky(x), c1, kernel, d)
                xt = _pad_conv(_leaky(xt), c2, kernel, 1)
                x = xt + x
        else:
            for c1, d in zip(params['convs1'], dilations):
                x = x + _pad_conv(_leaky(x), c1, kernel, d)
        return x

    def apply(self, params, mel_btc: jnp.ndarray) -> jnp.ndarray:
        """(B, T, mel_channels) normalized log-mel → (B, T·hop) waveform."""
        x = _pad_conv(mel_btc.astype(jnp.float32), params['conv_pre'], 7)
        n_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            x = _leaky(x)
            x = _conv_transpose1d(x, params['ups'][i], k, u, (k - u) // 2)
            xs = None
            for j, (rk, dils) in enumerate(zip(
                    self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes)):
                r = self._resblock(params['resblocks'][i * n_kernels + j],
                                   x, rk, dils)
                xs = r if xs is None else xs + r
            x = xs / n_kernels
        x = _leaky(x, 0.01)  # torch F.leaky_relu default before conv_post
        x = _pad_conv(x, params['conv_post'], 7)
        return jnp.tanh(x)[..., 0]

    def inference(self, mel, params=None) -> np.ndarray:
        """(C, T) or (B, C, T) normalized log-mel → float32 wav [-1, 1]."""
        params = self.params if params is None else params
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        if mel.shape[1] != self.mel_channels:
            raise ValueError(f'expected (B, {self.mel_channels}, T) mel, '
                             f'got {mel.shape}')
        fn = self._jit_cache.get('apply')
        if fn is None:
            fn = self._jit_cache['apply'] = jax.jit(self.apply)
        wav = np.asarray(fn(params, jnp.asarray(mel.transpose(0, 2, 1))))
        return wav[0] if squeeze else wav

    # ---------------------------------------------------- torch conversion

    @classmethod
    def from_torch_state_dict(cls, state_dict, config: dict = None,
                              mel_channels: int = 80) -> 'HiFiGANVocoder':
        """Build from a jik876/hifi-gan generator ``state_dict``. Topology
        (rates, kernel sizes, widths) is cross-checked against the tensor
        shapes; mismatches raise."""
        sd = {k: np.asarray(v) for k, v in state_dict.items()}
        model = cls(mel_channels=mel_channels, config=config)

        w = _folded(sd, 'conv_pre')
        assert w.shape == (model.initial_channel, mel_channels, 7), w.shape
        params = {'conv_pre': {'w': jnp.asarray(w.transpose(2, 1, 0)),
                               'b': jnp.asarray(sd['conv_pre.bias'])},
                  'ups': [], 'resblocks': []}
        ch = model.initial_channel
        for i, k in enumerate(model.upsample_kernel_sizes):
            w = _folded(sd, f'ups.{i}', transpose=True)
            assert w.shape == (ch, ch // 2, k), (w.shape, ch, k)
            w = w[:, :, ::-1].transpose(2, 0, 1)
            params['ups'].append({'w': jnp.asarray(np.ascontiguousarray(w)),
                                  'b': jnp.asarray(sd[f'ups.{i}.bias'])})
            ch //= 2
        n_res = len(model.upsample_rates) * len(model.resblock_kernel_sizes)
        ch = model.initial_channel
        for idx in range(n_res):
            if idx % len(model.resblock_kernel_sizes) == 0:
                ch //= 2
            rk = model.resblock_kernel_sizes[
                idx % len(model.resblock_kernel_sizes)]
            dils = model.resblock_dilation_sizes[
                idx % len(model.resblock_kernel_sizes)]
            blk = {'convs1': [], 'convs2': []}
            # resblock type 2 stores its convs under 'convs.'
            c1name = 'convs1' if f'resblocks.{idx}.convs1.0.weight_v' in sd \
                or f'resblocks.{idx}.convs1.0.weight' in sd else 'convs'
            for j in range(len(dils)):
                w = _folded(sd, f'resblocks.{idx}.{c1name}.{j}')
                assert w.shape == (ch, ch, rk), (w.shape, ch, rk)
                blk['convs1'].append(
                    {'w': jnp.asarray(w.transpose(2, 1, 0)),
                     'b': jnp.asarray(sd[f'resblocks.{idx}.{c1name}.{j}.bias'])})
                if model.resblock_type == '1':
                    w = _folded(sd, f'resblocks.{idx}.convs2.{j}')
                    assert w.shape == (ch, ch, rk), (w.shape, ch, rk)
                    blk['convs2'].append(
                        {'w': jnp.asarray(w.transpose(2, 1, 0)),
                         'b': jnp.asarray(sd[f'resblocks.{idx}.convs2.{j}.bias'])})
            params['resblocks'].append(blk)
        w = _folded(sd, 'conv_post')
        assert w.shape == (1, ch, 7), w.shape
        params['conv_post'] = {'w': jnp.asarray(w.transpose(2, 1, 0)),
                               'b': jnp.asarray(sd['conv_post.bias'])}
        model.params = params
        return model

    @classmethod
    def from_torch_checkpoint(cls, path, config: dict = None,
                              mel_channels: int = 80):
        """Load a jik876/hifi-gan checkpoint file (``{'generator': sd}``
        training checkpoints or a bare state_dict). ``config``: the dict
        from the checkpoint's config.json; v1 defaults if omitted."""
        from transformertts_tpu.models.vocoder import unwrap_torch_checkpoint
        return cls.from_torch_state_dict(
            unwrap_torch_checkpoint(path), config, mel_channels)
