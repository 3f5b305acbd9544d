"""MelGAN vocoder: JAX/TPU-native generator + torch-checkpoint converter.

The reference's recommended neural-vocoder workflow
(`/root/reference/notebooks/synthesize_forward_melgan.ipynb`) feeds the
ForwardTransformer's MelGAN-normalized log-mel into the pretrained
``seungwonpark/melgan`` torch generator (``vocoder.inference(mel)``). This
module provides the same capability on TPU: the generator topology of that
checkpoint family re-implemented as a functional JAX model (all compute is
dilated/transposed 1-D convs — MXU-friendly GEMMs under XLA), plus a
converter from the torch ``state_dict`` (weight-norm ``weight_g``/
``weight_v`` pairs are folded into plain kernels at load time — weight norm
is a training-time reparameterization only).

Topology (seungwonpark/melgan ``model/generator.py``, the published
LJSpeech checkpoint): ReflectionPad(3) → wnConv1d(80→512, k7) →
[LeakyReLU(0.2) → wnConvTranspose1d(k=2·s, stride s, pad s//2) →
ResStack(3 blocks, dilations 1/3/9, each with a wn-1×1 shortcut)] for
upsample rates (8, 8, 2, 2) → LeakyReLU → ReflectionPad(3) →
wnConv1d(→1, k7) → tanh; input scaled ``(mel + 5) / 5``; ``inference``
appends 10 frames of log(1e-5) silence and trims ``10·hop`` samples to cut
the edge artifact.

Orientation matches the notebook: ``inference`` takes ``(mel_channels, T)``
or batched ``(B, mel_channels, T)`` normalized log-mel (i.e. exactly
``model.predict(...)['mel'].T``).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LRELU_SLOPE = 0.2
LOG_MEL_SILENCE = float(np.log(1e-5))  # -11.5129...


# --------------------------------------------------------------------- spec

def _generator_spec(mel_channels: int, base_channels: int,
                    upsample_rates: Sequence[int]):
    """Static layer spec: list of ('conv'|'convT'|'res', ...) entries."""
    spec: List[Tuple] = [('conv', mel_channels, base_channels, 7, 1, 3)]
    ch = base_channels
    for r in upsample_rates:
        spec.append(('convT', ch, ch // 2, 2 * r, r, r // 2))
        ch //= 2
        spec.append(('res', ch))
    spec.append(('conv', ch, 1, 7, 1, 3))
    return spec


class MelGANVocoder:
    """Functional MelGAN generator. Params live in ``self.params`` (a list
    pytree aligned with the static spec); ``apply``/``inference`` are pure
    and jittable."""

    def __init__(self, mel_channels: int = 80, base_channels: int = 512,
                 upsample_rates: Sequence[int] = (8, 8, 2, 2),
                 res_dilations: Sequence[int] = (1, 3, 9)):
        self.mel_channels = mel_channels
        self.base_channels = base_channels
        self.upsample_rates = tuple(upsample_rates)
        self.res_dilations = tuple(res_dilations)
        self.hop_length = int(np.prod(upsample_rates))
        self.spec = _generator_spec(mel_channels, base_channels,
                                    upsample_rates)
        self.params = None
        self._jit_cache = {}

    def cache_key(self) -> tuple:
        """Static-architecture key: two MelGAN objects with equal keys have
        identical ``apply`` semantics (params are call arguments), so jitted
        executables can be shared instead of keyed on object identity."""
        return ('MelGAN', self.mel_channels, self.base_channels,
                self.upsample_rates, self.res_dilations)

    # ---------------------------------------------------------------- init

    def init_params(self, rng) -> list:
        params = []
        for entry in self.spec:
            kind = entry[0]
            if kind in ('conv', 'convT'):
                _, cin, cout, k, _, _ = entry
                rng, sub = jax.random.split(rng)
                params.append(_conv_init(sub, cin, cout, k))
            else:
                _, ch = entry
                blocks = []
                for d in self.res_dilations:
                    rng, r1, r2, r3 = jax.random.split(rng, 4)
                    blocks.append({
                        'dilated': _conv_init(r1, ch, ch, 3),
                        'pointwise': _conv_init(r2, ch, ch, 1),
                        'shortcut': _conv_init(r3, ch, ch, 1),
                    })
                params.append({'blocks': blocks})
        self.params = params
        return params

    # --------------------------------------------------------------- apply

    def apply(self, params, mel_btc: jnp.ndarray) -> jnp.ndarray:
        """(B, T, mel_channels) normalized log-mel → (B, T·hop) waveform."""
        x = (mel_btc.astype(jnp.float32) + 5.0) / 5.0
        i = 0
        for entry in self.spec:
            kind = entry[0]
            if kind == 'conv':
                _, _, _, k, _, pad = entry
                if i > 0:  # final conv: LeakyReLU precedes it
                    x = _leaky(x)
                x = _reflect_pad(x, pad)
                x = _conv1d(x, params[i])
            elif kind == 'convT':
                _, _, _, k, stride, pad = entry
                x = _leaky(x)
                x = _conv_transpose1d(x, params[i], k, stride, pad)
            else:  # res stack
                for blk, d in zip(params[i]['blocks'], self.res_dilations):
                    y = _leaky(x)
                    y = _reflect_pad(y, d)
                    y = _conv1d(y, blk['dilated'], dilation=d)
                    y = _leaky(y)
                    y = _conv1d(y, blk['pointwise'])
                    x = _conv1d(x, blk['shortcut']) + y
            i += 1
        return jnp.tanh(x)[..., 0]

    def inference(self, mel, params=None) -> np.ndarray:
        """Notebook-compatible entry: (C, T) or (B, C, T) normalized
        log-mel → float32 waveform in [-1, 1], edge artifact trimmed."""
        params = self.params if params is None else params
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        if mel.shape[1] != self.mel_channels:
            raise ValueError(f'expected (B, {self.mel_channels}, T) mel, '
                             f'got {mel.shape}')
        pad = np.full((mel.shape[0], self.mel_channels, 10),
                      LOG_MEL_SILENCE, np.float32)
        mel = np.concatenate([mel, pad], axis=2)
        fn = self._jit_cache.get('apply')
        if fn is None:
            fn = self._jit_cache['apply'] = jax.jit(self.apply)
        wav = np.asarray(fn(params, jnp.asarray(mel.transpose(0, 2, 1))))
        wav = wav[:, :-(self.hop_length * 10)]
        return wav[0] if squeeze else wav

    # ---------------------------------------------------- torch conversion

    @classmethod
    def from_torch_state_dict(cls, state_dict,
                              mel_channels: int = 80) -> 'MelGANVocoder':
        """Build from a ``seungwonpark/melgan``-family torch ``state_dict``
        (the hub module's, or the ``model_g`` entry of a training
        checkpoint). Weight-norm pairs are folded; every tensor is matched
        by name and shape-checked — mismatches raise."""
        sd = {k: np.asarray(v) for k, v in state_dict.items()}
        # drop a possible 'generator.' outer prefix shared by all keys
        prefixes = {k.split('.', 1)[0] for k in sd}
        if prefixes == {'generator'}:
            sd = {k.split('.', 1)[1]: v for k, v in sd.items()}

        # module indices that carry parameters, in order
        conv_idx = sorted({int(k.split('.', 1)[0]) for k in sd
                           if '.' in k and k.split('.', 1)[0].isdigit()})
        # infer upsample rates from the ConvTranspose kernel widths
        first_w = _folded(sd, f'{conv_idx[0]}')
        base_channels = first_w.shape[0]
        rates = []
        for idx in conv_idx[1:-1]:
            keys = [k for k in sd if k.startswith(f'{idx}.')]
            if any('blocks' in k for k in keys):
                continue
            w = sd[f'{idx}.weight_v'] if f'{idx}.weight_v' in sd \
                else sd[f'{idx}.weight']
            rates.append(w.shape[2] // 2)
        model = cls(mel_channels=mel_channels, base_channels=base_channels,
                    upsample_rates=rates)

        params = []
        it = iter(conv_idx)
        for entry in model.spec:
            kind = entry[0]
            idx = next(it)
            if kind == 'conv':
                _, cin, cout, k, _, _ = entry
                w = _folded(sd, f'{idx}')
                assert w.shape == (cout, cin, k), (w.shape, entry)
                params.append({'w': jnp.asarray(w.transpose(2, 1, 0)),
                               'b': jnp.asarray(sd[f'{idx}.bias'])})
            elif kind == 'convT':
                _, cin, cout, k, _, _ = entry
                w = _folded(sd, f'{idx}', transpose=True)
                assert w.shape == (cin, cout, k), (w.shape, entry)
                # torch ConvTranspose1d(in, out, k) ≡ conv over the
                # stride-dilated input with the time-flipped kernel
                w = w[:, :, ::-1].transpose(2, 0, 1)  # (k, in, out)
                params.append({'w': jnp.asarray(np.ascontiguousarray(w)),
                               'b': jnp.asarray(sd[f'{idx}.bias'])})
            else:
                _, ch = entry
                blocks = []
                for b, d in enumerate(model.res_dilations):
                    pre = f'{idx}.blocks.{b}'
                    dil = _folded(sd, f'{pre}.2')
                    pw = _folded(sd, f'{pre}.4')
                    sc = _folded(sd, f'{idx}.shortcuts.{b}')
                    assert dil.shape == (ch, ch, 3) and pw.shape == (ch, ch, 1)
                    blocks.append({
                        'dilated': {'w': jnp.asarray(dil.transpose(2, 1, 0)),
                                    'b': jnp.asarray(sd[f'{pre}.2.bias'])},
                        'pointwise': {'w': jnp.asarray(pw.transpose(2, 1, 0)),
                                      'b': jnp.asarray(sd[f'{pre}.4.bias'])},
                        'shortcut': {'w': jnp.asarray(sc.transpose(2, 1, 0)),
                                     'b': jnp.asarray(
                                         sd[f'{idx}.shortcuts.{b}.bias'])},
                    })
                params.append({'blocks': blocks})
        model.params = params
        return model

    @classmethod
    def from_torch_checkpoint(cls, path, mel_channels: int = 80):
        """Load a torch checkpoint file (hub weights or a training ckpt
        with a ``model_g`` entry)."""
        from transformertts_tpu.models.vocoder import unwrap_torch_checkpoint
        return cls.from_torch_state_dict(
            unwrap_torch_checkpoint(path), mel_channels)


# ----------------------------------------------------------------- helpers

def _conv_init(rng, cin, cout, k):
    scale = 1.0 / np.sqrt(cin * k)
    w = jax.random.uniform(rng, (k, cin, cout), jnp.float32, -scale, scale)
    b = jnp.zeros((cout,), jnp.float32)
    return {'w': w, 'b': b}


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _reflect_pad(x, p):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode='reflect')


def _conv1d(x, p, dilation: int = 1):
    y = lax.conv_general_dilated(
        x, p['w'], window_strides=(1,), padding=((0, 0),),
        rhs_dilation=(dilation,), dimension_numbers=('NHC', 'HIO', 'NHC'))
    return y + p['b']


def _conv_transpose1d(x, p, k: int, stride: int, pad: int):
    # output length (T-1)·s + k − 2·pad  =  T·s  for k = 2s, pad = s//2
    y = lax.conv_general_dilated(
        x, p['w'], window_strides=(1,),
        padding=((k - 1 - pad, k - 1 - pad),),
        lhs_dilation=(stride,), dimension_numbers=('NHC', 'HIO', 'NHC'))
    return y + p['b']


def _folded(sd, prefix, transpose=False):
    """Fold a weight-norm (g, v) pair into a plain kernel; pass through
    un-normed weights."""
    if f'{prefix}.weight_v' in sd:
        v = sd[f'{prefix}.weight_v']
        g = sd[f'{prefix}.weight_g']
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
        return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    return sd[f'{prefix}.weight'].astype(np.float32)
