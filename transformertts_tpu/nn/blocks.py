"""Transformer building blocks.

Functional re-implementations of the reference layer zoo
(model/layers.py:6-565): post-attention conv/FFN residual-norm stacks,
self/cross-attention blocks with the learnable positional-encoding scalar and
per-reduction-factor posenc striding, decoder prenet, postnet and the
duration/pitch stat predictors.

The reference's ``TransposedCNNResNorm`` wraps its convs in identity
transposes (model/layers.py:74,77 — ``perm=(0,1,2)``), so both conv variants
compute the same time-wise convolution; here there is a single ``CNNResNorm``
and the ``transposed_convs`` config flag is accepted for config compatibility.
"""
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from transformertts_tpu.nn import core
from transformertts_tpu.nn.attention import MultiHeadAttention
from transformertts_tpu.nn.posenc import positional_encoding


def _maybe_split(rng: Optional[jax.Array], n: int):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


class FFNResNorm:
    """x → LN(x + dropout(W2(relu(W1 x)))) (reference: model/layers.py:82-102)."""

    def __init__(self, model_dim: int, hidden: int, dropout_rate: float):
        self.d1 = core.Dense(model_dim, hidden, activation='relu')
        self.d2 = core.Dense(hidden, model_dim)
        self.ln = core.LayerNorm(model_dim)
        self.dropout_rate = dropout_rate

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'d1': self.d1, 'd2': self.d2, 'ln': self.ln})

    def apply(self, params, x, rng=None, deterministic=True):
        y = self.d2.apply(params['d2'], self.d1.apply(params['d1'], x))
        y = core.dropout(y, self.dropout_rate, rng, deterministic)
        return self.ln.apply(params['ln'], y + x)


class CNNResNorm:
    """Residual conv stack: convs w/ inner activations, last conv linear,
    dropout, LN(inputs + x) (reference: model/layers.py:6-40)."""

    def __init__(self, in_dim: int, filters: List[int], kernel_size: int,
                 inner_activation: str, dropout_rate: float):
        dims = [in_dim] + list(filters)
        self.convs = [core.Conv1D(dims[i], dims[i + 1], kernel_size,
                                  activation=inner_activation if i < len(filters) - 1 else None)
                      for i in range(len(filters))]
        self.ln = core.LayerNorm(filters[-1])
        self.dropout_rate = dropout_rate

    def init(self, key) -> core.Params:
        mods = {f'conv_{i}': c for i, c in enumerate(self.convs)}
        mods['ln'] = self.ln
        return core.init_submodules(key, mods)

    def apply(self, params, x, rng=None, deterministic=True):
        y = x
        for i, conv in enumerate(self.convs):
            y = conv.apply(params[f'conv_{i}'], y)
        y = core.dropout(y, self.dropout_rate, rng, deterministic)
        return self.ln.apply(params['ln'], x + y)


class CNNDropout:
    """Conv stack for stat predictors: each layer conv→act→LN→dropout
    (reference: model/layers.py:488-524)."""

    def __init__(self, in_dim: int, filters: List[int], kernel_size: int,
                 inner_activation: str, last_activation: str, dropout_rate: float):
        dims = [in_dim] + list(filters)
        acts = [inner_activation] * (len(filters) - 1) + [last_activation]
        self.convs = [core.Conv1D(dims[i], dims[i + 1], kernel_size, activation=acts[i])
                      for i in range(len(filters))]
        self.lns = [core.LayerNorm(f) for f in filters]
        self.dropout_rate = dropout_rate

    def init(self, key) -> core.Params:
        mods = {}
        for i, (c, ln) in enumerate(zip(self.convs, self.lns)):
            mods[f'conv_{i}'] = c
            mods[f'ln_{i}'] = ln
        return core.init_submodules(key, mods)

    def apply(self, params, x, rng=None, deterministic=True):
        rngs = _maybe_split(rng, len(self.convs))
        for i, conv in enumerate(self.convs):
            x = conv.apply(params[f'conv_{i}'], x)
            x = self.lns[i].apply(params[f'ln_{i}'], x)
            x = core.dropout(x, self.dropout_rate, rngs[i], deterministic)
        return x


class StatPredictor:
    """Duration/pitch predictor: mask → CNNDropout → Dense(1, act) → mask
    (reference: model/layers.py:463-485)."""

    def __init__(self, in_dim: int, conv_filters: List[int], kernel_size: int,
                 conv_activation: str, dense_activation: str, dropout_rate: float):
        self.conv_blocks = CNNDropout(in_dim, conv_filters, kernel_size,
                                      conv_activation, conv_activation, dropout_rate)
        self.linear = core.Dense(conv_filters[-1], 1, activation=dense_activation)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'conv_blocks': self.conv_blocks,
                                          'linear': self.linear})

    def apply(self, params, x, mask, rng=None, deterministic=True):
        """mask: (B, T, 1), 1 = real data."""
        mask = mask.astype(x.dtype)
        x = x * mask
        x = self.conv_blocks.apply(params['conv_blocks'], x, rng, deterministic)
        x = self.linear.apply(params['linear'], x)
        return x * mask


class SelfAttentionResNorm:

    def __init__(self, model_dim: int, num_heads: int, dropout_rate: float):
        self.mha = MultiHeadAttention(model_dim, num_heads, dropout_rate)
        self.ln = core.LayerNorm(model_dim)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'mha': self.mha, 'ln': self.ln})

    def apply(self, params, x, mask, rng=None, deterministic=True):
        attn_out, weights = self.mha.apply(params['mha'], x, x, x, mask,
                                           rng, deterministic)
        return self.ln.apply(params['ln'], attn_out + x), weights


class SelfAttentionDenseBlock:

    def __init__(self, model_dim: int, num_heads: int, hidden: int, dropout_rate: float):
        self.sarn = SelfAttentionResNorm(model_dim, num_heads, dropout_rate)
        self.ffn = FFNResNorm(model_dim, hidden, dropout_rate)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'sarn': self.sarn, 'ffn': self.ffn})

    def apply(self, params, x, mask, rng=None, deterministic=True):
        r1, r2 = _maybe_split(rng, 2)
        attn_out, weights = self.sarn.apply(params['sarn'], x, mask, r1,
                                            deterministic)
        # cast: the f32 mask must not promote the bf16 compute path
        keep = (1.0 - jnp.squeeze(mask, axis=(1, 2))[:, :, None]).astype(
            attn_out.dtype)                                       # (B, T, 1)
        attn_out = attn_out * keep
        out = self.ffn.apply(params['ffn'], attn_out, r2, deterministic) * keep
        return out, weights


class SelfAttentionConvBlock:

    def __init__(self, model_dim: int, num_heads: int, dropout_rate: float,
                 conv_filters: List[int], kernel_size: int, conv_activation: str):
        self.sarn = SelfAttentionResNorm(model_dim, num_heads, dropout_rate)
        self.conv = CNNResNorm(model_dim, conv_filters, kernel_size,
                               conv_activation, dropout_rate)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'sarn': self.sarn, 'conv': self.conv})

    def apply(self, params, x, mask, rng=None, deterministic=True):
        r1, r2 = _maybe_split(rng, 2)
        attn_out, weights = self.sarn.apply(params['sarn'], x, mask, r1,
                                            deterministic)
        keep = (1.0 - jnp.squeeze(mask, axis=(1, 2))[:, :, None]).astype(
            attn_out.dtype)
        attn_out = attn_out * keep
        out = self.conv.apply(params['conv'], attn_out, r2, deterministic) * keep
        return out, weights


class SelfAttentionBlocks:
    """Stack: LN → +scalar·posenc (strided by reduction factor) → dropout →
    dense blocks → conv blocks (reference: model/layers.py:267-310)."""

    def __init__(self, model_dim: int, feed_forward_dimension: Optional[int],
                 num_heads: List[int], maximum_position_encoding: int,
                 conv_filters: Optional[List[int]], dropout_rate: float,
                 dense_blocks: int, kernel_size: Optional[int],
                 conv_activation: Optional[str], name: str = 'Encoder'):
        self.name = name
        self.model_dim = model_dim
        self.dropout_rate = dropout_rate
        self.pos_encoding = positional_encoding(maximum_position_encoding, model_dim)
        self.dense_layers = [
            SelfAttentionDenseBlock(model_dim, h, feed_forward_dimension, dropout_rate)
            for h in num_heads[:dense_blocks]]
        self.conv_layers = [
            SelfAttentionConvBlock(model_dim, h, dropout_rate, conv_filters,
                                   kernel_size, conv_activation)
            for h in num_heads[dense_blocks:]]
        self.ln = core.LayerNorm(model_dim)

    def init(self, key) -> core.Params:
        mods = {'ln': self.ln}
        for i, b in enumerate(self.dense_layers):
            mods[f'dense_{i}'] = b
        for i, b in enumerate(self.conv_layers):
            mods[f'conv_{i}'] = b
        params = core.init_submodules(key, mods)
        params['pos_encoding_scalar'] = jnp.ones((), jnp.float32)
        return params

    def apply(self, params, x, mask, rng=None, deterministic=True,
              reduction_factor: int = 1, pos_offset: int = 0):
        seq_len = x.shape[1]
        y = self.ln.apply(params['ln'], x)
        pe = jax.lax.dynamic_slice_in_dim(
            self.pos_encoding, pos_offset * reduction_factor,
            seq_len * reduction_factor, axis=1)
        pe = pe[:, ::reduction_factor, :]
        # keep the compute dtype: the f32 scalar would otherwise promote
        # the whole stack to float32 (3x slower matmuls on MXU)
        y = y + (params['pos_encoding_scalar'].astype(y.dtype)
                 * pe.astype(y.dtype))
        rngs = _maybe_split(rng, 1 + len(self.dense_layers) + len(self.conv_layers))
        y = core.dropout(y, self.dropout_rate, rngs[0], deterministic)
        attention_weights = {}
        for i, block in enumerate(self.dense_layers):
            y, w = block.apply(params[f'dense_{i}'], y, mask, rngs[1 + i],
                               deterministic)
            attention_weights[f'{self.name}_DenseBlock{i + 1}_SelfAttention'] = w
        off = 1 + len(self.dense_layers)
        for i, block in enumerate(self.conv_layers):
            y, w = block.apply(params[f'conv_{i}'], y, mask, rngs[off + i],
                               deterministic)
            attention_weights[f'{self.name}_ConvBlock{i + 1}_SelfAttention'] = w
        return y, attention_weights


class CrossAttentionResnorm:

    def __init__(self, model_dim: int, num_heads: int, dropout_rate: float):
        self.mha = MultiHeadAttention(model_dim, num_heads, dropout_rate)
        self.ln = core.LayerNorm(model_dim)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'mha': self.mha, 'ln': self.ln})

    def apply(self, params, q, k, v, mask, rng=None, deterministic=True):
        attn, weights = self.mha.apply(params['mha'], v, k, q, mask, rng, deterministic)
        return self.ln.apply(params['ln'], attn + q), weights


class CrossAttentionDenseBlock:

    def __init__(self, model_dim: int, num_heads: int, hidden: int, dropout_rate: float):
        self.sarn = SelfAttentionResNorm(model_dim, num_heads, dropout_rate)
        self.carn = CrossAttentionResnorm(model_dim, num_heads, dropout_rate)
        self.ffn = FFNResNorm(model_dim, hidden, dropout_rate)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'sarn': self.sarn, 'carn': self.carn,
                                          'ffn': self.ffn})

    def apply(self, params, x, enc_output, look_ahead_mask, padding_mask,
              rng=None, deterministic=True):
        r1, r2, r3 = _maybe_split(rng, 3)
        attn1, w1 = self.sarn.apply(params['sarn'], x, look_ahead_mask, r1, deterministic)
        attn2, w2 = self.carn.apply(params['carn'], attn1, enc_output, enc_output,
                                    padding_mask, r2, deterministic)
        out = self.ffn.apply(params['ffn'], attn2, r3, deterministic)
        return out, w1, w2


class CrossAttentionBlocks:
    """Decoder stack for the Aligner (reference: model/layers.py:381-417)."""

    def __init__(self, model_dim: int, feed_forward_dimension: int,
                 num_heads: List[int], maximum_position_encoding: int,
                 dropout_rate: float, name: str = 'Decoder'):
        self.name = name
        self.model_dim = model_dim
        self.dropout_rate = dropout_rate
        self.pos_encoding = positional_encoding(maximum_position_encoding, model_dim)
        self.blocks = [CrossAttentionDenseBlock(model_dim, h, feed_forward_dimension,
                                                dropout_rate)
                       for h in num_heads]
        self.ln = core.LayerNorm(model_dim)

    def init(self, key) -> core.Params:
        mods = {'ln': self.ln}
        for i, b in enumerate(self.blocks):
            mods[f'block_{i}'] = b
        params = core.init_submodules(key, mods)
        params['pos_encoding_scalar'] = jnp.ones((), jnp.float32)
        return params

    def apply(self, params, x, enc_output, decoder_padding_mask,
              encoder_padding_mask, rng=None, deterministic=True,
              reduction_factor: int = 1, pos_offset: int = 0
              ) -> Tuple[jax.Array, dict]:
        seq_len = x.shape[1]
        y = self.ln.apply(params['ln'], x)
        pe = jax.lax.dynamic_slice_in_dim(
            self.pos_encoding, pos_offset * reduction_factor,
            seq_len * reduction_factor, axis=1)
        pe = pe[:, ::reduction_factor, :]
        # keep the compute dtype: the f32 scalar would otherwise promote
        # the whole stack to float32 (3x slower matmuls on MXU)
        y = y + (params['pos_encoding_scalar'].astype(y.dtype)
                 * pe.astype(y.dtype))
        rngs = _maybe_split(rng, 1 + len(self.blocks))
        y = core.dropout(y, self.dropout_rate, rngs[0], deterministic)
        attention_weights = {}
        n = len(self.blocks)
        for i, block in enumerate(self.blocks):
            y, _, w = block.apply(params[f'block_{i}'], y, enc_output,
                                  decoder_padding_mask, encoder_padding_mask,
                                  rngs[1 + i], deterministic)
            if i == n - 1:
                attention_weights[f'{self.name}_LastBlock_CrossAttention'] = w
            else:
                attention_weights[f'{self.name}_DenseBlock{i + 1}_CrossAttention'] = w
        return y, attention_weights


class DecoderPrenet:
    """Two relu denses with dropout (reference: model/layers.py:420-443).

    The dropout rate is an ``apply``-time Python float that is BAKED INTO
    each compiled executable at trace time (the reference keeps it in a
    non-trainable tf.Variable, but nothing in the reference mutates it at
    runtime either — it is a constructor constant in both frameworks;
    changing it requires rebuilding the jitted steps).
    """

    def __init__(self, in_dim: int, model_dim: int, dense_hidden_units: int):
        self.d1 = core.Dense(in_dim, dense_hidden_units, activation='relu')
        self.d2 = core.Dense(dense_hidden_units, model_dim, activation='relu')

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'d1': self.d1, 'd2': self.d2})

    def apply(self, params, x, dropout_rate: float = 0.0, rng=None, deterministic=True):
        r1, r2 = _maybe_split(rng, 2)
        x = self.d1.apply(params['d1'], x)
        x = core.dropout(x, dropout_rate, r1, deterministic)
        x = self.d2.apply(params['d2'], x)
        x = core.dropout(x, dropout_rate, r2, deterministic)
        return x


class Postnet:
    """Final projections: mel + 3-way stop logits (reference: model/layers.py:446-460)."""

    def __init__(self, in_dim: int, mel_channels: int):
        self.stop_linear = core.Dense(in_dim, 3)
        self.mel_out = core.Dense(in_dim, mel_channels)

    def init(self, key) -> core.Params:
        return core.init_submodules(key, {'stop_linear': self.stop_linear,
                                          'mel_out': self.mel_out})

    def apply(self, params, x):
        return {'mel': self.mel_out.apply(params['mel_out'], x),
                'stop_prob': self.stop_linear.apply(params['stop_linear'], x)}
