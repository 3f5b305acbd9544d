"""Aligner: autoregressive encoder–decoder Transformer alignment teacher.

Capability parity with the reference Aligner (model/models.py:15-341):
text-embedding prenet → self-attention encoder; mel DecoderPrenet →
cross-attention decoder → Dense(mel·r) projection with reduction factor r
(r mel frames per decoder step, max_r=10) → Postnet (mel + 3-way stop
logits). Teacher-forced ``align()`` exposes the last cross-attention block
for duration extraction; ``predict()`` runs autoregressive synthesis with
stop-token halting.

TPU-first re-design (vs. the TF reference):
- ``r`` and the diagonal-forcing flags are **static arguments**: one compiled
  executable per (r, flags, bucket) instead of tf.function re-tracing
  (reference models.py:229-245).
- AR ``predict`` is a ``lax.while_loop`` with **KV caches** for decoder
  self-attention and **precomputed cross-attention K/V** — the reference
  re-runs the full decoder over all frames each step with a host sync per
  iteration (models.py:279-291); here the whole loop is one XLA program and
  the stop check happens on device.
"""
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.nn import blocks, core, masks
from transformertts_tpu.text import TextToTokens
from transformertts_tpu.utils.pytree import host_array


class Aligner:

    def __init__(self,
                 encoder_model_dimension: int,
                 decoder_model_dimension: int,
                 encoder_num_heads: list,
                 decoder_num_heads: list,
                 encoder_max_position_encoding: int,
                 decoder_max_position_encoding: int,
                 encoder_prenet_dimension: int,
                 decoder_prenet_dimension: int,
                 dropout_rate: float,
                 mel_start_value: float,
                 mel_end_value: float,
                 mel_channels: int,
                 phoneme_language: str,
                 with_stress: bool,
                 decoder_prenet_dropout: float,
                 model_breathing: bool,
                 encoder_feed_forward_dimension: int = None,
                 decoder_feed_forward_dimension: int = None,
                 max_r: int = 10,
                 compute_dtype: str = 'float32',
                 debug: bool = False,
                 **kwargs):
        self.config = self._make_config(locals(), kwargs)
        self.text_pipeline = TextToTokens.default(
            phoneme_language, add_start_end=True, with_stress=with_stress,
            model_breathing=model_breathing)
        self.symbols = self.text_pipeline.tokenizer.alphabet
        self.mel_channels = mel_channels
        self.max_r = max_r
        self.r = max_r
        self.stop_prob_index = 2
        self.decoder_prenet_dropout = decoder_prenet_dropout
        self.compute_dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
        self.start_vec = np.full((1, mel_channels), mel_start_value, np.float32)
        self.end_vec = np.full((1, mel_channels), mel_end_value, np.float32)
        self.step = 0

        self.encoder_prenet = core.Embedding(
            self.text_pipeline.tokenizer.vocab_size, encoder_prenet_dimension)
        self.encoder = blocks.SelfAttentionBlocks(
            model_dim=encoder_model_dimension,
            feed_forward_dimension=encoder_feed_forward_dimension,
            num_heads=encoder_num_heads,
            maximum_position_encoding=encoder_max_position_encoding,
            conv_filters=None, dropout_rate=dropout_rate,
            dense_blocks=len(encoder_num_heads), kernel_size=None,
            conv_activation=None, name='Encoder')
        self.decoder_prenet = blocks.DecoderPrenet(
            mel_channels, decoder_model_dimension, decoder_prenet_dimension)
        self.decoder = blocks.CrossAttentionBlocks(
            model_dim=decoder_model_dimension,
            feed_forward_dimension=decoder_feed_forward_dimension,
            num_heads=decoder_num_heads,
            maximum_position_encoding=decoder_max_position_encoding,
            dropout_rate=dropout_rate, name='Decoder')
        self.final_proj_mel = core.Dense(decoder_model_dimension,
                                         mel_channels * max_r)
        self.decoder_postnet = blocks.Postnet(mel_channels, mel_channels)
        self.params: Optional[dict] = None
        self._jit_predict_cache = {}
        self._jit_align = None

    # ------------------------------------------------------------------ init

    def _make_config(self, locals_: dict, kwargs: dict) -> dict:
        from transformertts_tpu.models.persistence import make_config
        return make_config(locals_, kwargs)

    def init_params(self, key) -> dict:
        # one jitted call: eager init dispatches one tiny op per tensor,
        # which costs minutes through a remote-dispatch TPU tunnel
        def init(k):
            return core.init_submodules(k, {
                'encoder_prenet': self.encoder_prenet,
                'encoder': self.encoder,
                'decoder_prenet': self.decoder_prenet,
                'decoder': self.decoder,
                'final_proj_mel': self.final_proj_mel,
                'decoder_postnet': self.decoder_postnet,
            })
        params = jax.jit(init)(key)
        self.params = params
        return params

    # --------------------------------------------------------------- compute

    def encode(self, params, tokens: jax.Array, rng=None, deterministic=True):
        enc_pad_mask = masks.encoder_padding_mask(tokens)
        x = self.encoder_prenet.apply(params['encoder_prenet'], tokens)
        x = x.astype(self.compute_dtype)
        enc_out, enc_attn = self.encoder.apply(
            params['encoder'], x, enc_pad_mask, rng, deterministic)
        return enc_out, enc_pad_mask, enc_attn

    def decode(self, params, enc_out: jax.Array, mel_inp: jax.Array,
               enc_pad_mask: jax.Array, r: int, rng=None, deterministic=True):
        """mel_inp: (B, T_r, C) r-strided teacher-forced decoder input."""
        r1, r2 = blocks._maybe_split(rng, 2)
        dec_pad_mask = masks.mel_padding_mask(mel_inp)
        la_mask = masks.look_ahead_mask(mel_inp.shape[1])
        combined = jnp.maximum(dec_pad_mask, la_mask[None, None, :, :])
        dec_in = self.decoder_prenet.apply(
            params['decoder_prenet'], mel_inp.astype(self.compute_dtype),
            dropout_rate=self.decoder_prenet_dropout, rng=r1,
            deterministic=deterministic)
        dec_out, dec_attn = self.decoder.apply(
            params['decoder'], dec_in, enc_out, combined, enc_pad_mask,
            r2, deterministic, reduction_factor=r)
        proj = self.final_proj_mel.apply(params['final_proj_mel'], dec_out)
        proj = proj[:, :, :r * self.mel_channels]
        b, t = proj.shape[0], proj.shape[1]
        mel = proj.reshape(b, t * r, self.mel_channels).astype(jnp.float32)
        post = self.decoder_postnet.apply(params['decoder_postnet'], mel)
        return {'mel': post['mel'], 'stop_prob': post['stop_prob'],
                'linear': mel, 'decoder_attention': dec_attn,
                'mel_mask': dec_pad_mask}

    def apply(self, params, tokens: jax.Array, mel_inp: jax.Array, r: int,
              rng=None, deterministic=True) -> dict:
        """Teacher-forced forward. mel_inp is already r-strided."""
        r1, r2 = blocks._maybe_split(rng, 2)
        enc_out, enc_pad_mask, enc_attn = self.encode(
            params, tokens, r1, deterministic)
        out = self.decode(params, enc_out, mel_inp, enc_pad_mask, r,
                          r2, deterministic)
        out['encoder_attention'] = enc_attn
        out['text_mask'] = enc_pad_mask
        return out

    # ------------------------------------------------------------------ align

    def align(self, text, mel, mels_have_start_end_vectors=False,
              phonemize=False, encode_phonemes=False):
        """Teacher-forced pass returning the last-block cross-attention map
        (the duration-extraction input; reference models.py:258-276)."""
        assert self.params is not None
        if phonemize:
            text = self.text_pipeline.phonemizer(text)
        if encode_phonemes:
            text = self.text_pipeline.tokenizer(text)
        tokens = np.asarray(text, np.int32)
        if tokens.ndim < 2:
            tokens = tokens[None, :]
        mel = np.asarray(mel, np.float32)
        if mel.ndim < 3:
            mel = mel[None, ...]
        if mels_have_start_end_vectors:
            tar_inp = mel[:, :-1]
        else:
            start = np.tile(self.start_vec[None, ...], (mel.shape[0], 1, 1))
            tar_inp = np.concatenate([start, mel], axis=1)
        strided = tar_inp[:, ::self.r, :]
        if self._jit_align is None:
            self._jit_align = jax.jit(
                lambda p, t, m: self.apply(p, t, m, self.r, deterministic=True),
                static_argnames=())
        out = self._jit_align(self.params, jnp.asarray(tokens),
                              jnp.asarray(strided))
        attn = out['decoder_attention']['Decoder_LastBlock_CrossAttention']
        return np.asarray(attn), out

    # ---------------------------------------------------------------- predict

    def _decode_step_cached(self, params, x_pos, pos_idx, k_caches, v_caches,
                            cross_k, cross_v, self_mask, enc_pad_mask, r):
        """One decoder position through all blocks with KV caches.

        x_pos: (B, 1, C_mel) mel input for this position; pos_idx: () int32.
        k_caches/v_caches: per-block (B, H, T_max, D) self-attention rings.
        cross_k/cross_v: per-block precomputed encoder K/V.
        Returns (mel_r (B, r, mel), stop (B, r, 3), cross_attn_last, caches).
        """
        dec = self.decoder
        y = self.decoder_prenet.apply(
            params['decoder_prenet'], x_pos.astype(self.compute_dtype),
            dropout_rate=self.decoder_prenet_dropout, deterministic=True)
        y = dec.ln.apply(params['decoder']['ln'], y)
        pe = jax.lax.dynamic_slice_in_dim(dec.pos_encoding, pos_idx * r, 1, axis=1)
        y = y + (params['decoder']['pos_encoding_scalar'].astype(y.dtype)
                 * pe.astype(y.dtype))
        new_k, new_v = [], []
        last_cross_w = None
        for i, block in enumerate(dec.blocks):
            bp = params['decoder'][f'block_{i}']
            # self-attention over the cache
            attn1, _, k_c, v_c = block.sarn.mha.apply_cached(
                bp['sarn']['mha'], y, k_caches[i], v_caches[i], y, pos_idx,
                self_mask)
            attn1 = block.sarn.ln.apply(bp['sarn']['ln'], attn1 + y)
            # cross-attention against precomputed encoder K/V
            attn2, cross_w = block.carn.mha.apply_kv(
                bp['carn']['mha'], attn1, cross_k[i], cross_v[i], enc_pad_mask)
            attn2 = block.carn.ln.apply(bp['carn']['ln'], attn2 + attn1)
            y = block.ffn.apply(bp['ffn'], attn2, deterministic=True)
            new_k.append(k_c)
            new_v.append(v_c)
            last_cross_w = cross_w
        proj = self.final_proj_mel.apply(params['final_proj_mel'], y)
        proj = proj[:, :, :r * self.mel_channels]
        linear = proj.reshape(proj.shape[0], r, self.mel_channels).astype(jnp.float32)
        post = self.decoder_postnet.apply(params['decoder_postnet'], linear)
        return post['mel'], post['stop_prob'], last_cross_w, new_k, new_v

    def _build_predict_fn(self, max_steps: int, r: int):
        n_blocks = len(self.decoder.blocks)
        # head counts can differ per block (published config: [4,4,4,4,1]),
        # so each block's KV cache gets its own (H_i, D_i) shape
        head_shapes = [(b.sarn.mha.num_heads, b.sarn.mha.depth)
                       for b in self.decoder.blocks]
        last_heads = self.decoder.blocks[-1].carn.mha.num_heads

        def predict_fn(params, tokens):
            enc_out, enc_pad_mask, _ = self.encode(params, tokens,
                                                   deterministic=True)
            cross_k, cross_v = [], []
            for i, block in enumerate(self.decoder.blocks):
                bp = params['decoder'][f'block_{i}']
                k, v = block.carn.mha.project_kv(bp['carn']['mha'], enc_out)
                cross_k.append(k)
                cross_v.append(v)
            b = tokens.shape[0]
            n_tok = tokens.shape[1]
            dtype = self.compute_dtype
            k0 = [jnp.zeros((b, h, max_steps, d), dtype)
                  for h, d in head_shapes]
            v0 = [jnp.zeros((b, h, max_steps, d), dtype)
                  for h, d in head_shapes]
            mel_buf = jnp.zeros((b, max_steps * r, self.mel_channels), jnp.float32)
            attn_buf = jnp.zeros((b, last_heads, max_steps, n_tok), jnp.float32)
            x0 = jnp.tile(jnp.asarray(self.start_vec, jnp.float32)[None, ...],
                          (b, 1, 1))
            steps = jnp.arange(max_steps)

            def cond(carry):
                i, stopped, *_ = carry
                return jnp.logical_and(i < max_steps, jnp.logical_not(stopped))

            def body(carry):
                i, stopped, x, mel_buf, attn_buf, ks, vs = carry
                # causal mask over cache positions > i
                self_mask = (steps[None, None, None, :] > i).astype(jnp.float32)
                mel_r, stop, cross_w, ks, vs = self._decode_step_cached(
                    params, x, i, ks, vs, cross_k, cross_v, self_mask,
                    enc_pad_mask, r)
                mel_buf = jax.lax.dynamic_update_slice(
                    mel_buf, mel_r, (0, i * r, 0))
                attn_buf = jax.lax.dynamic_update_slice(
                    attn_buf, cross_w.astype(jnp.float32), (0, 0, i, 0))
                stop_now = (jnp.argmax(stop[0, -1], axis=-1)
                            == self.stop_prob_index)
                x_next = mel_r[:, -1:, :]
                return (i + 1, stop_now, x_next, mel_buf, attn_buf, ks, vs)

            init = (jnp.asarray(0), jnp.asarray(False), x0, mel_buf, attn_buf,
                    k0, v0)
            i, stopped, _, mel_buf, attn_buf, _, _ = jax.lax.while_loop(
                cond, body, init)
            return mel_buf, attn_buf, i

        return jax.jit(predict_fn)

    def predict(self, inp, max_length: int = 1000, encode: bool = True,
                verbose: bool = False) -> dict:
        """AR text→mel. One fused on-device while_loop (no per-step host sync)."""
        assert self.params is not None
        if encode:
            inp = self.encode_text(inp)
        tokens = np.asarray(inp, np.int32)
        if tokens.ndim < 2:
            tokens = tokens[None, :]
        if tokens.shape[0] != 1:
            # the stop check gates on sample 0 and only sample 0's mel is
            # returned — a silent wrong answer for B>1 (reference predict is
            # also single-sample, model/models.py:271-292)
            raise ValueError('Aligner.predict is single-sample; '
                             f'got batch of {tokens.shape[0]}')
        # pad tokens to a bucket so arbitrary sentences share executables
        n_pad = max(32, -(-tokens.shape[1] // 32) * 32)
        tokens = np.pad(tokens, ((0, 0), (0, n_pad - tokens.shape[1])))
        max_steps = int(max_length // self.r) + 1
        key = (max_steps, self.r, tokens.shape[1])
        if key not in self._jit_predict_cache:
            self._jit_predict_cache[key] = self._build_predict_fn(
                max_steps, self.r)
        mel_buf, attn_buf, n_steps = self._jit_predict_cache[key](
            self.params, jnp.asarray(tokens))
        n = int(n_steps)
        if verbose:
            print(f'stopped after {n} steps')
        return {'mel': host_array(np.asarray(mel_buf)[0, : n * self.r]),
                'decoder_attention': host_array(
                    np.asarray(attn_buf)[:, :, :n, :]),
                'n_steps': n}

    # ------------------------------------------------------------- constants

    def set_constants(self, reduction_factor: int = None, **kwargs):
        """r is a host-side static constant selecting the compiled variant.

        Unknown kwargs raise: constants baked at trace time (e.g.
        decoder_prenet_dropout) cannot be changed here, and silently
        accepting them would hide that."""
        if kwargs:
            raise TypeError(
                f'set_constants got unsupported constants {sorted(kwargs)}; '
                'only reduction_factor is runtime-settable (other model '
                'constants are baked into the compiled steps at trace time)')
        if reduction_factor is not None and reduction_factor != self.r:
            self.r = int(reduction_factor)
            self._jit_align = None

    def encode_text(self, text):
        return self.text_pipeline(text)

    # ----------------------------------------------------------- persistence

    def save_model(self, path, weights_format: str = 'npz'):
        """weights_format: 'npz', 'hdf5' (legacy Keras-2 interop), 'both'."""
        from transformertts_tpu.models.persistence import save_model_dir
        save_model_dir(self, path, weights_format)

    @classmethod
    def load_model(cls, path) -> 'Aligner':
        from transformertts_tpu.models.persistence import load_model_dir
        return load_model_dir(cls, path)

    @classmethod
    def from_config(cls, config: dict, max_r: int = None) -> 'Aligner':
        config = dict(config)
        if max_r is not None:
            config['max_r'] = max_r
        return cls(**config)
