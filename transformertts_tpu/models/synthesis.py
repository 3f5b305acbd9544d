"""Batched text→wav synthesis (serving path).

The reference synthesizes one sentence at a time (predict_tts.py:52-63, host
Griffin-Lim per line). Here a whole file of sentences runs as a few device
rounds: sentences are tokenized, sorted by length, cut into chunks padded to
bucketed (batch, token, frame) shapes — a small, enumerable executable menu —
and each chunk runs encoder then a single fused decode→waveform dispatch
(decoder + denorm + mel inversion + Griffin-Lim, or decoder + neural
vocoder). Waveforms ship as PCM16 and each wav is trimmed to its own
predicted length on host.

``warmup_serving`` precompiles the executable menu up front so a serving
process never compiles at request time.
"""
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TOKEN_BUCKET = 32
FRAME_BUCKET = 128


def _round_up(x, m):
    return -(-x // m) * m


def _batch_bucket(b: int, max_batch: int, min_batch: int = 1) -> int:
    """Round a ragged chunk size up to a power of two (≤ max_batch): the
    executable menu stays {1, 2, 4, …, max_batch} instead of growing by one
    entry per distinct final-chunk size. ``min_batch`` (e.g. the mesh's
    data-axis size) floors the bucket so sharded batches stay divisible."""
    if b >= max_batch:
        return max_batch
    p = max(1, min_batch)
    while p < b:
        p *= 2
    return min(p, max_batch)


def _dispatch_decode_wav(model, audio, vocoder, n_iter,
                         features, pitch, durations, scalar, keep, frames):
    """One fused decode→waveform dispatch; returns (device_wav, hop)."""
    if vocoder is not None:
        wav_dev, _ = model._decode_vocoder_jit(vocoder)(
            model.params, vocoder.params, features, pitch, durations,
            jnp.asarray(scalar), keep, frames)
        return wav_dev, vocoder.hop_length
    wav_dev, _ = model._decode_wav_jit(
        audio, n_iter or audio.griffin_lim_iters)(
        model.params, features, pitch, durations,
        jnp.asarray(scalar), keep, frames)
    return wav_dev, audio.hop_length


def synthesize_lines(model, audio, lines: Sequence[str],
                     speed_regulator: float = 1.0, n_iter: int = None,
                     max_batch: int = 32, vocoder=None,
                     mesh=None) -> List[np.ndarray]:
    """Synthesize many sentences; returns wavs in input order.

    ``vocoder``: optional neural vocoder (models/melgan.MelGANVocoder or
    models/hifigan.HiFiGANVocoder); when given, waveforms come from the
    fused decoder+vocoder dispatch instead of Griffin-Lim.

    ``mesh``: optional ('data', 'model') jax.sharding.Mesh — serving chunks
    shard their batch axis over the 'data' devices (params replicate once;
    XLA runs each dispatch SPMD across the mesh). ``max_batch`` should be a
    multiple of the data-axis size."""
    n_data = 1
    if mesh is not None and mesh.devices.size > 1:
        from transformertts_tpu.parallel import mesh as mesh_util
        n_data = mesh.shape[mesh_util.DATA_AXIS]
        model.params = mesh_util.shard_params(mesh, model.params)
        if vocoder is not None:
            vocoder.params = mesh_util.shard_params(mesh, vocoder.params)
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
    # Ragged chunk batches pad up to a power-of-two bucket; padding rows are
    # all-pad token rows, masked out by the model's keep mask.
    encoded = []
    for chunk in chunks:
        n_tok = _round_up(max(len(t) for _, t in chunk), TOKEN_BUCKET)
        b = _batch_bucket(len(chunk), max_batch, min_batch=n_data)
        tok = np.zeros((b, n_tok), np.int32)
        for row, (_, t) in enumerate(chunk):
            tok[row, :len(t)] = t
        if n_data > 1:
            from transformertts_tpu.parallel import mesh as mesh_util
            tok_dev = jax.device_put(tok, mesh_util.batch_sharding(mesh, 1))
        else:
            tok_dev = jnp.asarray(tok)
        encoded.append(model._encode_jit()(model.params, tok_dev))

    # Phase 2: size each chunk's frame budget from its predicted durations
    # and dispatch the fused decode→waveform call (every eager op between
    # decoder and waveform costs a host↔device round trip per chunk).
    decoded = []
    for chunk, (features, durations, pitch, keep) in zip(chunks, encoded):
        dur = np.asarray(durations)[:, :, 0] * float(scalar)
        dur = dur * np.asarray(keep)[:, :, 0]
        totals = np.round(dur).sum(axis=1).astype(int) + 1
        frames = _round_up(int(totals[:len(chunk)].max()), FRAME_BUCKET)
        wav_dev, hop = _dispatch_decode_wav(
            model, audio, vocoder, n_iter,
            features, pitch, durations, scalar, keep, frames)
        decoded.append((chunk, totals, wav_dev, hop))

    # Phase 3: ONE bulk fetch per chunk; trim per sentence on host
    # (per-row device slicing would cost a round trip per sentence).
    # Both paths ship PCM16; convert back to float here.
    for chunk, totals, wav_dev, hop in decoded:
        wav_batch = np.asarray(wav_dev)
        if wav_batch.dtype == np.int16:
            wav_batch = wav_batch.astype(np.float32) / 32767.0
        for row, (orig_idx, _) in enumerate(chunk):
            n_frames = int(totals[row]) - 1
            wavs[orig_idx] = wav_batch[row][:n_frames * hop]
    return wavs


def warmup_serving(model, audio, max_batch: int = 32,
                   token_buckets: Sequence[int] = (32, 64, 96, 128),
                   frame_buckets: Sequence[int] = (128, 256, 384),
                   n_iter: int = None, vocoder=None,
                   include_ragged_batches: bool = False,
                   mesh=None) -> int:
    """Precompile the serving executable menu so no request ever compiles.

    Runs one tiny dummy call per (batch, n_tok, frames) combination through
    the encoder and the fused decode→waveform dispatch. With the persistent
    XLA compile cache enabled this is one-time work per machine. Returns the
    number of (token, frame) shape combinations warmed.

    ``include_ragged_batches`` additionally warms the power-of-two batch
    buckets below ``max_batch`` (used by final chunks of short workloads).
    ``mesh``: warm the SPMD executables used by mesh-sharded serving.
    """
    n_data = 1
    if mesh is not None and mesh.devices.size > 1:
        from transformertts_tpu.parallel import mesh as mesh_util
        n_data = mesh.shape[mesh_util.DATA_AXIS]
        model.params = mesh_util.shard_params(mesh, model.params)
        if vocoder is not None:
            vocoder.params = mesh_util.shard_params(mesh, vocoder.params)
    batches = [max_batch]
    if include_ragged_batches:
        p = n_data
        while p < max_batch:
            batches.append(p)
            p *= 2
    count = 0
    for b in batches:
        for n_tok in token_buckets:
            tok = np.ones((b, n_tok), np.int32)
            if n_data > 1:
                from transformertts_tpu.parallel import mesh as mesh_util
                tok_dev = jax.device_put(
                    tok, mesh_util.batch_sharding(mesh, 1))
            else:
                tok_dev = jnp.asarray(tok)
            features, durations, pitch, keep = model._encode_jit()(
                model.params, tok_dev)
            for frames in frame_buckets:
                wav_dev, _ = _dispatch_decode_wav(
                    model, audio, vocoder, n_iter,
                    features, pitch, durations, np.float32(1.0), keep,
                    frames)
                count += 1
    # block on the last dispatch so "warm" means compiled AND executed
    np.asarray(wav_dev[0, :1])
    return count
