"""ForwardTransformer: non-autoregressive FastSpeech2/FastPitch-style TTS.

Capability parity with the reference model (model/models.py:344-643):
embedding → self-attention encoder → duration & pitch StatPredictors → pitch
embedding added to encoder output → length-regulator expansion → self-attention
decoder → Dense(mel). Inference supports ``speed_regulator`` and per-phoneme
min/max duration clamps; checkpoints are self-describing directories
(config.yaml + weights) rebuildable with zero external config.

TPU-first re-design decisions (vs. the TF reference):
- the model object holds only static configuration + parameter pytrees;
  all compute is in pure jitted functions with **static shapes**. One compiled
  executable per (token-bucket, frame-bucket) pair instead of tf.function
  retracing.
- the RaggedTensor ``Expand`` is replaced by the static-shape gather length
  regulator (nn/length_regulator.py).
- inference is two jitted phases: ``encode`` (tokens → durations/pitch/
  features) then ``decode`` at a frame budget rounded up to a bucket —
  so arbitrary sentences reuse a small set of compiled programs.
"""
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.nn import core, blocks, masks
from transformertts_tpu.nn.length_regulator import regulate_length
from transformertts_tpu.text import TextToTokens
from transformertts_tpu.utils.pytree import host_array

FRAME_BUCKET = 128  # decode frame budgets are rounded up to multiples of this


def _audio_cache_key(audio) -> tuple:
    """Hashable key of everything an Audio object bakes into the fused
    decode→wav closures (normalizer math + inversion geometry). Two Audio
    objects with equal keys compile to identical programs, so jit caches key
    on this instead of ``id(audio)`` — a serving process constructing a fresh
    Audio per request must not grow one executable per call."""
    return (type(audio.normalizer).__name__, audio.sampling_rate,
            audio.n_fft, audio.hop_length, audio.win_length,
            audio.f_min, audio.f_max, audio.mel_channels)


class ForwardTransformer:

    def __init__(self,
                 encoder_model_dimension: int,
                 decoder_model_dimension: int,
                 dropout_rate: float,
                 decoder_num_heads: list,
                 encoder_num_heads: list,
                 encoder_max_position_encoding: int,
                 decoder_max_position_encoding: int,
                 encoder_dense_blocks: int,
                 decoder_dense_blocks: int,
                 duration_conv_filters: list,
                 pitch_conv_filters: list,
                 duration_kernel_size: int,
                 pitch_kernel_size: int,
                 predictors_dropout: float,
                 mel_channels: int,
                 phoneme_language: str,
                 with_stress: bool,
                 model_breathing: bool,
                 transposed_attn_convs: bool = True,
                 encoder_attention_conv_filters: list = None,
                 decoder_attention_conv_filters: list = None,
                 encoder_attention_conv_kernel: int = None,
                 decoder_attention_conv_kernel: int = None,
                 encoder_feed_forward_dimension: int = None,
                 decoder_feed_forward_dimension: int = None,
                 compute_dtype: str = 'float32',
                 debug: bool = False,
                 **kwargs):
        self.config = self._make_config(locals(), kwargs)
        self.text_pipeline = TextToTokens.default(
            phoneme_language, add_start_end=False, with_stress=with_stress,
            model_breathing=model_breathing)
        self.symbols = self.text_pipeline.tokenizer.alphabet
        self.mel_channels = mel_channels
        self.compute_dtype = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
        self.step = 0
        dim = encoder_model_dimension

        self.encoder_prenet = core.Embedding(
            self.text_pipeline.tokenizer.vocab_size, dim)
        self.encoder = blocks.SelfAttentionBlocks(
            model_dim=dim, feed_forward_dimension=encoder_feed_forward_dimension,
            num_heads=encoder_num_heads,
            maximum_position_encoding=encoder_max_position_encoding,
            conv_filters=encoder_attention_conv_filters,
            dropout_rate=dropout_rate, dense_blocks=encoder_dense_blocks,
            kernel_size=encoder_attention_conv_kernel, conv_activation='relu',
            name='Encoder')
        self.dur_pred = blocks.StatPredictor(
            dim, duration_conv_filters, duration_kernel_size,
            conv_activation='relu', dense_activation='relu',
            dropout_rate=predictors_dropout)
        self.pitch_pred = blocks.StatPredictor(
            dim, pitch_conv_filters, pitch_kernel_size,
            conv_activation='relu', dense_activation='linear',
            dropout_rate=predictors_dropout)
        self.pitch_embed = core.Dense(1, dim, activation='relu')
        self.decoder = blocks.SelfAttentionBlocks(
            model_dim=decoder_model_dimension,
            feed_forward_dimension=decoder_feed_forward_dimension,
            num_heads=decoder_num_heads,
            maximum_position_encoding=decoder_max_position_encoding,
            conv_filters=decoder_attention_conv_filters,
            dropout_rate=dropout_rate, dense_blocks=decoder_dense_blocks,
            kernel_size=decoder_attention_conv_kernel, conv_activation='relu',
            name='Decoder')
        self.out = core.Dense(decoder_model_dimension, mel_channels)
        self.params: Optional[dict] = None
        self._jit_encode = None
        self._jit_decode = None
        self._jit_predict_wav = {}
        self._jit_decode_wav = {}

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
                'dur_pred': self.dur_pred,
                'pitch_pred': self.pitch_pred,
                'pitch_embed': self.pitch_embed,
                'decoder': self.decoder,
                'out': self.out,
            })
        params = jax.jit(init)(key)
        self.params = params
        return params

    # --------------------------------------------------------------- compute

    def encode(self, params, tokens: jax.Array, rng=None, deterministic=True):
        """tokens (B, N) → dict with encoder features, durations, pitch."""
        r1, r2, r3, r4 = blocks._maybe_split(rng, 4)
        enc_pad_mask = masks.encoder_padding_mask(tokens)
        x = self.encoder_prenet.apply(params['encoder_prenet'], tokens)
        x = x.astype(self.compute_dtype)
        x, encoder_attention = self.encoder.apply(
            params['encoder'], x, enc_pad_mask, r1, deterministic)
        keep = 1.0 - jnp.squeeze(enc_pad_mask, axis=(1, 2))[:, :, None]
        keep = keep.astype(x.dtype)
        durations = self.dur_pred.apply(params['dur_pred'], x, keep, r2, deterministic)
        pitch = self.pitch_pred.apply(params['pitch_pred'], x, keep, r3, deterministic)
        return {'features': x, 'durations': durations, 'pitch': pitch,
                'keep_mask': keep, 'encoder_attention': encoder_attention,
                'rng': r4}

    def decode(self, params, features: jax.Array, use_durations: jax.Array,
               max_frames: int, rng=None, deterministic=True):
        """Expand by durations and decode to mel. use_durations: (B, N)."""
        mels, frame_valid = regulate_length(features, use_durations, max_frames)
        expanded_mask = (1.0 - frame_valid)[:, None, None, :]
        mels, decoder_attention = self.decoder.apply(
            params['decoder'], mels, expanded_mask, rng, deterministic,
            reduction_factor=1)
        mels = self.out.apply(params['out'], mels)
        mels = mels * frame_valid[:, :, None].astype(mels.dtype)
        return {'mel': mels.astype(jnp.float32), 'expanded_mask': expanded_mask,
                'decoder_attention': decoder_attention}

    def apply(self, params, tokens: jax.Array, max_frames: int,
              target_durations: Optional[jax.Array] = None,
              target_pitch: Optional[jax.Array] = None,
              durations_scalar: float = 1.0,
              max_durations_mask: Optional[jax.Array] = None,
              min_durations_mask: Optional[jax.Array] = None,
              rng=None, deterministic=True) -> dict:
        """Full forward pass (training & inference), static shapes.

        target_durations/target_pitch: (B, N, 1) or None (use predictions).
        Mirrors reference call semantics (model/models.py:518-550).
        """
        enc = self.encode(params, tokens, rng, deterministic)
        x, durations, pitch = enc['features'], enc['durations'], enc['pitch']
        if target_pitch is not None:
            pitch_embed = self.pitch_embed.apply(
                params['pitch_embed'], target_pitch.astype(x.dtype))
        else:
            pitch_embed = self.pitch_embed.apply(params['pitch_embed'], pitch)
        x = x + pitch_embed
        if target_durations is not None:
            use_durations = target_durations
        else:
            use_durations = durations * durations_scalar
        if max_durations_mask is not None:
            use_durations = jnp.minimum(use_durations, max_durations_mask[:, :, None])
        if min_durations_mask is not None:
            use_durations = jnp.maximum(use_durations, min_durations_mask[:, :, None])
        # padded phonemes must not emit frames
        use_durations = use_durations[:, :, 0] * enc['keep_mask'][:, :, 0]
        dec = self.decode(params, x, use_durations, max_frames,
                          enc['rng'], deterministic)
        return {'mel': dec['mel'],
                'duration': durations.astype(jnp.float32),
                'pitch': pitch.astype(jnp.float32),
                'expanded_mask': dec['expanded_mask'],
                'encoder_attention': enc['encoder_attention'],
                'decoder_attention': dec['decoder_attention']}

    # ------------------------------------------------------------- inference

    def encode_text(self, text: str):
        return self.text_pipeline(text)

    def _encode_jit(self):
        if self._jit_encode is None:
            def fn(params, tokens):
                enc = self.encode(params, tokens, deterministic=True)
                return enc['features'], enc['durations'], enc['pitch'], enc['keep_mask']
            self._jit_encode = jax.jit(fn)
        return self._jit_encode

    def _decode_jit(self):
        if self._jit_decode is None:
            def fn(params, features, pitch, durations, max_durations_mask,
                   min_durations_mask, durations_scalar, keep, max_frames):
                pitch_embed = self.pitch_embed.apply(params['pitch_embed'], pitch)
                x = features + pitch_embed
                use = durations * durations_scalar
                use = jnp.minimum(use, max_durations_mask[:, :, None])
                use = jnp.maximum(use, min_durations_mask[:, :, None])
                use = use[:, :, 0] * keep[:, :, 0]
                dec = self.decode(params, x, use, max_frames, deterministic=True)
                return dec['mel']
            self._jit_decode = jax.jit(fn, static_argnames=('max_frames',))
        return self._jit_decode

    def _decode_features(self, params, features, pitch, durations,
                         durations_scalar, keep, max_frames):
        """Shared serving prefix: pitch embed + duration scale + decode."""
        pitch_embed = self.pitch_embed.apply(params['pitch_embed'], pitch)
        x = features + pitch_embed
        use = durations[:, :, 0] * durations_scalar * keep[:, :, 0]
        return self.decode(params, x, use, max_frames, deterministic=True)

    @staticmethod
    def _to_pcm16(wav):
        """(B, T) float wav → int16 PCM, matching ``wav_io.save_wav``'s
        per-utterance peak normalization (rescale when |peak| > 1 instead
        of hard-clipping, which would distort loud outputs). Shipping PCM16
        halves device→host transfer — the serving bottleneck through a
        remote tunnel."""
        peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
        wav = wav / jnp.maximum(peak, 1.0)
        return (wav * 32767.0).astype(jnp.int16)

    @staticmethod
    def _mask_mel_to_silence(dec: dict, silence: float):
        """Replace zero-masked padding frames with the normalizer's SILENCE
        level before any waveform stage: 0.0 in normalized log-mel space is
        amplitude 1.0 (loud), so zero padding would bleed noise into clip
        tails through Griffin-Lim / the vocoder's receptive field and could
        dominate PCM16 peak normalization."""
        valid = (1.0 - dec['expanded_mask'][:, 0, 0, :])[:, :, None]
        return dec['mel'] * valid + silence * (1.0 - valid)

    def _decode_wav_jit(self, audio, n_iter: int):
        """Batched decode → denorm → mel inversion → Griffin-Lim, fused into
        ONE jitted dispatch (the serving-path analogue of ``predict_wav``).

        Each eager op between the decoder and the waveform costs a full
        host↔device round trip per serving chunk; fusing them keeps the
        chunk at two dispatches total (encode + this).
        Returns ``(pcm16_wav_batch, mel_batch)`` at the static frame budget.
        """
        # key on the normalizer-relevant config (not id(audio)): a serving
        # process constructing a fresh Audio per request must reuse the same
        # compiled executable instead of growing the cache without bound
        key = (_audio_cache_key(audio), n_iter)
        if key not in self._jit_decode_wav:
            from transformertts_tpu.audio import griffinlim
            silence = float(np.asarray(audio.normalizer.normalize(
                np.full((1, 1), 1e-10, np.float32)))[0, 0])

            def fn(params, features, pitch, durations, durations_scalar,
                   keep, max_frames):
                dec = self._decode_features(params, features, pitch,
                                            durations, durations_scalar,
                                            keep, max_frames)
                mel = self._mask_mel_to_silence(dec, silence)
                amp = audio._denormalize(mel)
                S = griffinlim.mel_to_linear(
                    amp, audio.sampling_rate, audio.n_fft, audio.f_min,
                    audio.f_max)
                wav = jax.vmap(lambda s: griffinlim.griffin_lim(
                    s, n_iter, audio.n_fft, audio.hop_length,
                    audio.win_length))(S)
                return self._to_pcm16(wav), mel
            self._jit_decode_wav[key] = jax.jit(
                fn, static_argnames=('max_frames',))
        return self._jit_decode_wav[key]

    def _decode_vocoder_jit(self, vocoder):
        """Batched decode → neural vocoder, fused into ONE jitted dispatch
        (the vocoder analogue of ``_decode_wav_jit``; a raw ``vocoder.apply``
        call would run the whole generator op-by-op eagerly).
        Returns ``(pcm16_wav_batch, mel_batch)``."""
        norm = self.config.get('normalizer', 'MelGAN')
        if norm != 'MelGAN':
            # the neural vocoders consume MelGAN-scale log-mels; a WaveRNN-
            # normalized model would feed them wrong-scale input and the
            # LOG_MEL_SILENCE padding level below would also be wrong
            raise ValueError(
                f"neural vocoders expect MelGAN-normalized mels, but this "
                f"model was trained with normalizer={norm!r}; use the "
                f"Griffin-Lim path instead")
        # architecture-keyed (like _audio_cache_key): a serving process that
        # loads a fresh vocoder per request reuses one executable instead of
        # accumulating one per object id
        key = ('vocoder', vocoder.cache_key() if hasattr(vocoder, 'cache_key')
               else id(vocoder))
        if key not in self._jit_decode_wav:
            from transformertts_tpu.models.melgan import LOG_MEL_SILENCE

            def fn(params, voc_params, features, pitch, durations,
                   durations_scalar, keep, max_frames):
                dec = self._decode_features(params, features, pitch,
                                            durations, durations_scalar,
                                            keep, max_frames)
                mel = self._mask_mel_to_silence(dec, LOG_MEL_SILENCE)
                wav = vocoder.apply(voc_params, mel)
                return self._to_pcm16(wav), mel
            self._jit_decode_wav[key] = jax.jit(
                fn, static_argnames=('max_frames',))
        return self._jit_decode_wav[key]

    def predict_wav(self, inp, audio, encode: bool = True,
                    speed_regulator: float = 1.0, max_frames: int = 384,
                    n_iter: int = None):
        """Latency-optimized text → waveform: encoder, duration expansion,
        decoder AND Griffin-Lim fused into ONE jitted device call.

        The two-phase ``predict`` pays a host round-trip to size the frame
        budget; here decode always runs at the static ``max_frames`` budget
        and the wav is trimmed on host — one device dispatch total, which
        matters when each dispatch crosses a network tunnel.
        Returns (wav, mel) trimmed to the predicted length.
        """
        assert self.params is not None
        if encode:
            inp = self.encode_text(inp)
        tokens = np.asarray(inp, np.int32)
        if tokens.ndim < 2:
            tokens = tokens[None, :]
        n_orig = tokens.shape[1]
        n_pad = max(32, -(-n_orig // 32) * 32)
        tokens = np.pad(tokens, ((0, 0), (0, n_pad - n_orig)))
        n_iter = n_iter if n_iter is not None else audio.griffin_lim_iters
        fn = self._predict_wav_jit(audio, max_frames, n_iter)
        # ONE device_get for all three results: on remote-dispatch backends
        # (axon tunnel) every separate fetch costs a full network round trip
        # — three sequential np.asarray calls measured 124 ms vs 47 ms for a
        # single batched fetch (scripts/measure_dispatch_breakdown.py)
        wav, mel, n_frames = jax.device_get(fn(
            self.params, jnp.asarray(tokens),
            jnp.float32(1.0 / speed_regulator)))
        n = int(n_frames)
        return (wav[: n * audio.hop_length], mel[:n])

    def _predict_wav_jit(self, audio, max_frames: int, n_iter: int):
        """Build (or fetch cached) the fused text→wav executable used by
        ``predict_wav``; keyed on the normalizer-relevant audio config
        (see ``_decode_wav_jit``)."""
        key = (max_frames, n_iter, _audio_cache_key(audio))
        if key not in self._jit_predict_wav:
            from transformertts_tpu.audio import griffinlim
            silence = float(np.asarray(audio.normalizer.normalize(
                np.full((1, 1), 1e-10, np.float32)))[0, 0])

            def fn(params, tok, scalar):
                enc = self.encode(params, tok, deterministic=True)
                x = enc['features'] + self.pitch_embed.apply(
                    params['pitch_embed'], enc['pitch'])
                use = enc['durations'][:, :, 0] * scalar * enc['keep_mask'][:, :, 0]
                dec = self.decode(params, x, use, max_frames,
                                  deterministic=True)
                mel = self._mask_mel_to_silence(dec, silence)[0]
                n_frames = jnp.sum(jnp.round(use)).astype(jnp.int32) + 1
                amp = audio._denormalize(mel)
                S = griffinlim.mel_to_linear(amp, audio.sampling_rate,
                                             audio.n_fft, audio.f_min,
                                             audio.f_max)
                wav = griffinlim.griffin_lim(S, n_iter, audio.n_fft,
                                             audio.hop_length,
                                             audio.win_length)
                return wav, mel, n_frames
            self._jit_predict_wav[key] = jax.jit(fn)
        return self._jit_predict_wav[key]

    def predict(self, inp, encode: bool = True, speed_regulator: float = 1.0,
                phoneme_max_duration: dict = None, phoneme_min_duration: dict = None,
                phoneme_durations=None, phoneme_pitch=None, max_frames: int = None
                ) -> dict:
        """Text (or token ids) → mel. Public API parity with the reference
        (model/models.py:559-577); runs as two jitted device phases."""
        assert self.params is not None, 'model has no parameters; init or load first'
        if encode:
            inp = self.encode_text(inp)
        tokens = np.asarray(inp, np.int32)
        if tokens.ndim < 2:
            tokens = tokens[None, :]
        n_orig = tokens.shape[1]
        # pad tokens to a bucket so arbitrary sentences share executables
        n_pad = max(32, -(-n_orig // 32) * 32)
        tokens = np.pad(tokens, ((0, 0), (0, n_pad - n_orig)))
        duration_scalar = np.float32(1.0 / speed_regulator)
        max_mask = self._make_max_duration_mask(tokens, phoneme_max_duration)
        min_mask = self._make_min_duration_mask(tokens, phoneme_min_duration)

        features, durations, pitch, keep = self._encode_jit()(
            self.params, jnp.asarray(tokens))
        # one batched fetch of the host-needed phase-1 results (each separate
        # fetch is a full round trip on remote-dispatch backends — see
        # scripts/measure_dispatch_breakdown.py)
        durations_h, keep_h = jax.device_get((durations, keep))
        if phoneme_pitch is not None:
            p = np.zeros((1, n_pad, 1), np.float32)
            p[0, :n_orig, 0] = np.asarray(phoneme_pitch,
                                          np.float32).reshape(-1)[:n_orig]
            pitch = jnp.asarray(p)
        if phoneme_durations is not None:
            durations_used = np.zeros((1, n_pad, 1), np.float32)
            durations_used[0, :n_orig, 0] = np.asarray(
                phoneme_durations, np.float32).reshape(-1)[:n_orig]
            duration_scalar = np.float32(1.0)  # explicit durations bypass speed
        else:
            durations_used = durations_h
        # frame budget: host-side rounding to a bucket keeps the decode jit
        # cache small while shapes stay static
        clamped = np.minimum(durations_used[:, :, 0] * float(duration_scalar), max_mask)
        clamped = np.maximum(clamped, min_mask)
        clamped = clamped * keep_h[:, :, 0]
        total = int(np.round(clamped).sum(axis=1).max()) + 1
        if max_frames is None:
            max_frames = max(FRAME_BUCKET, int(np.ceil(total / FRAME_BUCKET)) * FRAME_BUCKET)
        mel = self._decode_jit()(
            self.params, features, pitch,
            jnp.asarray(durations_used), jnp.asarray(max_mask), jnp.asarray(min_mask),
            jnp.asarray(duration_scalar), keep, max_frames)
        # trim padding frames (always keep at least one: an untrained model
        # can predict zero total duration, and empty mels break downstream
        # STFT padding)
        n_valid = max(1, int(np.round(clamped).sum(axis=1).max()))
        mel_h, pitch_h = jax.device_get((mel, pitch))  # one fetch round trip
        out = {'mel': host_array(mel_h[0, :n_valid]),
               'duration': host_array(np.asarray(durations_used)[:, :n_orig]),
               'pitch': host_array(pitch_h[:, :n_orig])}
        return out

    def _make_max_duration_mask(self, tokens: np.ndarray, phoneme_max_duration):
        mask = np.full(tokens.shape, np.float32(1e9))
        if phoneme_max_duration is not None:
            for symbol, value in phoneme_max_duration.items():
                phon_idx = self.text_pipeline.tokenizer(symbol)[0]
                mask[tokens == phon_idx] = value
        return mask.astype(np.float32)

    def _make_min_duration_mask(self, tokens: np.ndarray, phoneme_min_duration):
        mask = np.zeros(tokens.shape, np.float32)
        if phoneme_min_duration is not None:
            for symbol, value in phoneme_min_duration.items():
                phon_idx = self.text_pipeline.tokenizer(symbol)[0]
                mask[tokens == phon_idx] = value
        return mask.astype(np.float32)

    # ----------------------------------------------------------- persistence

    def save_model(self, path, weights_format: str = 'npz'):
        """Self-describing checkpoint dir: config.yaml + weights
        (format parity with reference save_model, model/models.py:600-618).

        weights_format: 'npz' (native), 'hdf5' (legacy Keras-2 layout the
        reference TF code can ``load_weights`` — two-way interop), or 'both'.
        """
        from transformertts_tpu.models.persistence import save_model_dir
        save_model_dir(self, path, weights_format)

    @classmethod
    def load_model(cls, path: str) -> 'ForwardTransformer':
        from transformertts_tpu.models.persistence import load_model_dir
        return load_model_dir(cls, path)

    @classmethod
    def from_config(cls, config: dict) -> 'ForwardTransformer':
        return cls(**config)
