"""Batched text→wav synthesis (serving path).

The reference synthesizes one sentence at a time (predict_tts.py:52-63, host
Griffin-Lim per line). Here a whole file of sentences runs as a few device
calls: sentences are tokenized, grouped into token-length buckets (static
shapes → a handful of compiled programs), each bucket runs one batched
encode→decode at a shared frame budget, and waveforms come back from ONE
vmapped on-device Griffin-Lim per bucket. Each wav is trimmed to its own
predicted length.
"""
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

TOKEN_BUCKET = 32
FRAME_BUCKET = 128


def _round_up(x, m):
    return -(-x // m) * m


def synthesize_lines(model, audio, lines: Sequence[str],
                     speed_regulator: float = 1.0, n_iter: int = None,
                     max_batch: int = 32, vocoder=None) -> List[np.ndarray]:
    """Synthesize many sentences; returns wavs in input order.

    ``vocoder``: optional neural vocoder (models/melgan.MelGANVocoder);
    when given, waveforms come from one batched vocoder call per bucket
    instead of Griffin-Lim."""
    entries = []   # (orig_idx, tokens)
    for i, line in enumerate(lines):
        tokens = model.encode_text(line)
        entries.append((i, np.asarray(tokens, np.int32)))
    wavs: List[np.ndarray] = [None] * len(entries)

    # Length-grouped chunking: sort by token count, cut into max_batch-sized
    # chunks, pad each chunk to its own bucketed max length. This yields the
    # minimum chunk count — ceil(N / max_batch) device rounds — while keeping
    # padding waste bounded (a chunk spans only adjacent lengths) and shapes
    # bucketed (n_tok rounds to TOKEN_BUCKET → a small executable menu).
    entries.sort(key=lambda e: len(e[1]))
    chunks = [entries[s:s + max_batch]
              for s in range(0, len(entries), max_batch)]

    scalar = np.float32(1.0 / speed_regulator)

    # Phase 1: dispatch every encoder call (async — overlaps across chunks).
    encoded = []
    for chunk in chunks:
        n_tok = _round_up(max(len(t) for _, t in chunk), TOKEN_BUCKET)
        tok = np.zeros((len(chunk), n_tok), np.int32)
        for row, (_, t) in enumerate(chunk):
            tok[row, :len(t)] = t
        encoded.append(model._encode_jit()(model.params, jnp.asarray(tok)))

    # Phase 2: size each chunk's frame budget from its predicted durations
    # and dispatch the fused decode→waveform call (decoder + denorm + mel
    # inversion + Griffin-Lim in ONE jitted dispatch — every eager op in
    # between would cost a host↔device round trip per chunk).
    decoded = []
    for chunk, (features, durations, pitch, keep) in zip(chunks, encoded):
        dur = np.asarray(durations)[:, :, 0] * float(scalar)
        dur = dur * np.asarray(keep)[:, :, 0]
        totals = np.round(dur).sum(axis=1).astype(int) + 1
        frames = _round_up(int(totals.max()), FRAME_BUCKET)
        if vocoder is not None:
            wav_dev, _ = model._decode_vocoder_jit(vocoder)(
                model.params, vocoder.params, features, pitch, durations,
                jnp.asarray(scalar), keep, frames)
            hop = vocoder.hop_length
        else:
            wav_dev, _ = model._decode_wav_jit(
                audio, n_iter or audio.griffin_lim_iters)(
                model.params, features, pitch, durations,
                jnp.asarray(scalar), keep, frames)
            hop = audio.hop_length
        decoded.append((chunk, totals, wav_dev, hop))

    # Phase 3: ONE bulk fetch per chunk; trim per sentence on host
    # (per-row device slicing would cost a round trip per sentence).
    # The Griffin-Lim path ships PCM16 and converts back to float here.
    for chunk, totals, wav_dev, hop in decoded:
        wav_batch = np.asarray(wav_dev)
        if wav_batch.dtype == np.int16:
            wav_batch = wav_batch.astype(np.float32) / 32767.0
        for row, (orig_idx, _) in enumerate(chunk):
            n_frames = int(totals[row]) - 1
            wavs[orig_idx] = wav_batch[row][:n_frames * hop]
    return wavs
