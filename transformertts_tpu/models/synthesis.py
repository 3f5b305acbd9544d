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

    # bucket by padded token length
    buckets = {}
    for idx, tokens in entries:
        key = _round_up(len(tokens), TOKEN_BUCKET)
        buckets.setdefault(key, []).append((idx, tokens))

    scalar = np.float32(1.0 / speed_regulator)
    for n_tok, items in sorted(buckets.items()):
        for start in range(0, len(items), max_batch):
            chunk = items[start:start + max_batch]
            b = len(chunk)
            tok = np.zeros((b, n_tok), np.int32)
            for row, (_, t) in enumerate(chunk):
                tok[row, :len(t)] = t
            features, durations, pitch, keep = model._encode_jit()(
                model.params, jnp.asarray(tok))
            dur = np.asarray(durations)[:, :, 0] * float(scalar)
            dur = dur * np.asarray(keep)[:, :, 0]
            totals = np.round(dur).sum(axis=1).astype(int) + 1
            frames = _round_up(int(totals.max()), FRAME_BUCKET)
            ones = np.ones((b, n_tok), np.float32)
            mel = model._decode_jit()(
                model.params, features, pitch, durations,
                jnp.asarray(ones * np.float32(1e9)), jnp.asarray(ones * 0.0),
                jnp.asarray(scalar), keep, frames)
            if vocoder is not None:
                wav_batch = vocoder.apply(vocoder.params, mel)
                hop = vocoder.hop_length
            else:
                wav_batch = audio.reconstruct_waveform_batch(mel, n_iter=n_iter)
                hop = audio.hop_length
            for row, (orig_idx, _) in enumerate(chunk):
                n_frames = int(totals[row]) - 1
                n_samples = n_frames * hop
                wavs[orig_idx] = np.asarray(wav_batch[row][:n_samples])
    return wavs
