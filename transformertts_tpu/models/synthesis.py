"""Batched text→wav synthesis (serving path).

The reference synthesizes one sentence at a time (predict_tts.py:52-63, host
Griffin-Lim per line). Here a whole file of sentences runs as a few device
rounds: sentences are tokenized, sorted by length, cut into chunks padded to
bucketed (batch, token, frame) shapes — a small, enumerable executable menu —
and each chunk runs encoder then a single fused decode→waveform dispatch
(decoder + denorm + mel inversion + Griffin-Lim, or decoder + neural
vocoder). Waveforms ship as PCM16 and each wav is trimmed to its own
predicted length on host. Device residency is bounded: at most
``MAX_INFLIGHT`` chunks are in flight between dispatch and fetch.

``warmup_serving`` precompiles the executable menu up front so a serving
process never compiles at request time.
"""
from collections import deque
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TOKEN_BUCKET = 32
FRAME_BUCKET = 128
# chunks dispatched but not yet fetched: enough to hide fetch latency
# behind device work without holding a whole corpus of wavs on device
MAX_INFLIGHT = 4


def _round_up(x, m):
    return -(-x // m) * m


def _batch_bucket(b: int, max_batch: int, min_batch: int = 1) -> int:
    """Round a ragged chunk size up to a power-of-two multiple of
    ``min_batch`` (≤ max_batch): the executable menu stays
    {min_batch·2^k} ∪ {max_batch} instead of growing by one entry per
    distinct final-chunk size. ``min_batch`` (the mesh's data-axis size)
    keeps every bucket divisible for sharding."""
    if b >= max_batch:
        return max_batch
    p = max(1, min_batch)
    while p < b:
        p *= 2
    return min(p, max_batch)


def _prepare_mesh(model, vocoder, mesh):
    """Returns (n_data, replicated_model_params, replicated_vocoder_params).

    Params are placed as mesh-replicated COPIES handed to the jits for this
    call only — ``model.params`` is not mutated, so the model keeps working
    on its original devices afterwards."""
    if mesh is None or mesh.devices.size <= 1:
        return 1, model.params, (vocoder.params if vocoder is not None
                                 else None)
    from transformertts_tpu.parallel import mesh as mesh_util
    n_data = mesh.shape[mesh_util.DATA_AXIS]
    params = mesh_util.shard_params(mesh, model.params)
    voc_params = (mesh_util.shard_params(mesh, vocoder.params)
                  if vocoder is not None else None)
    return n_data, params, voc_params


def _place_tokens(tok: np.ndarray, mesh, n_data: int):
    if n_data > 1:
        from transformertts_tpu.parallel import mesh as mesh_util
        return jax.device_put(tok, mesh_util.batch_sharding(mesh, 1))
    return jnp.asarray(tok)


def _dispatch_decode_wav(model, audio, vocoder, n_iter, params, voc_params,
                         features, pitch, durations, scalar, keep, frames):
    """One fused decode→waveform dispatch; returns (device_wav, hop)."""
    if vocoder is not None:
        wav_dev, _ = model._decode_vocoder_jit(vocoder)(
            params, voc_params, features, pitch, durations,
            jnp.asarray(scalar), keep, frames)
        return wav_dev, vocoder.hop_length
    n_iter = n_iter if n_iter is not None else audio.griffin_lim_iters
    wav_dev, _ = model._decode_wav_jit(audio, n_iter)(
        params, features, pitch, durations,
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
    shard their batch axis over the 'data' devices (params replicate for
    this call; XLA runs each dispatch SPMD across the mesh)."""
    n_data, params, voc_params = _prepare_mesh(model, vocoder, mesh)
    max_batch = _round_up(max_batch, n_data)

    entries = []   # (orig_idx, tokens)
    wavs: List[np.ndarray] = [None] * len(lines)
    for i, line in enumerate(lines):
        tokens = np.asarray(model.encode_text(line), np.int32)
        if tokens.size == 0:
            # phonemization dropped every character (foreign symbols etc.);
            # a zero-token row would give the encoder a zero-width input
            wavs[i] = np.zeros((0,), np.float32)
            continue
        entries.append((i, tokens))
    if not entries:
        return wavs

    # Length-grouped chunking: sort by token count, cut into max_batch-sized
    # chunks, pad each chunk to its own bucketed max length. This yields the
    # minimum chunk count — ceil(N / max_batch) device rounds — while keeping
    # padding waste bounded (a chunk spans only adjacent lengths) and shapes
    # bucketed (n_tok rounds to TOKEN_BUCKET → a small executable menu).
    entries.sort(key=lambda e: len(e[1]))
    chunks = [entries[s:s + max_batch]
              for s in range(0, len(entries), max_batch)]

    scalar = np.float32(1.0 / speed_regulator)

    def encode_chunk(chunk):
        # ragged chunk batches pad up to a bucket; padding rows are all-pad
        # token rows, masked out by the model's keep mask
        n_tok = _round_up(max(len(t) for _, t in chunk), TOKEN_BUCKET)
        b = _batch_bucket(len(chunk), max_batch, min_batch=n_data)
        tok = np.zeros((b, n_tok), np.int32)
        for row, (_, t) in enumerate(chunk):
            tok[row, :len(t)] = t
        return model._encode_jit()(params, _place_tokens(tok, mesh, n_data))

    def fetch(chunk, totals, wav_dev, hop):
        # ONE bulk fetch per chunk (per-row device slicing costs a round
        # trip per sentence); PCM16 converts back to float here
        wav_batch = np.asarray(wav_dev)
        if wav_batch.dtype == np.int16:
            wav_batch = wav_batch.astype(np.float32) / 32767.0
        for row, (orig_idx, _) in enumerate(chunk):
            n_frames = int(totals[row]) - 1
            wavs[orig_idx] = wav_batch[row][:n_frames * hop]

    # Pipelined loop: encode for chunk i+1 dispatches before chunk i's
    # decode (device work overlaps host-side duration sizing), each chunk
    # runs ONE fused decode→waveform dispatch (every eager op in between
    # would cost a host↔device round trip), and at most MAX_INFLIGHT
    # decoded chunks stay resident before their wavs are fetched.
    pending = deque()
    enc_next = encode_chunk(chunks[0]) if chunks else None
    for i, chunk in enumerate(chunks):
        enc, enc_next = enc_next, (encode_chunk(chunks[i + 1])
                                   if i + 1 < len(chunks) else None)
        features, durations, pitch, keep = enc
        # one batched fetch (separate np.asarray calls cost one network
        # round trip EACH on remote-dispatch backends — measured in
        # scripts/measure_dispatch_breakdown.py)
        durations_h, keep_h = jax.device_get((durations, keep))
        dur = durations_h[:, :, 0] * float(scalar)
        dur = dur * keep_h[:, :, 0]
        totals = np.round(dur).sum(axis=1).astype(int) + 1
        frames = _round_up(int(totals[:len(chunk)].max()), FRAME_BUCKET)
        wav_dev, hop = _dispatch_decode_wav(
            model, audio, vocoder, n_iter, params, voc_params,
            features, pitch, durations, scalar, keep, frames)
        pending.append((chunk, totals, wav_dev, hop))
        if len(pending) >= MAX_INFLIGHT:
            fetch(*pending.popleft())
    while pending:
        fetch(*pending.popleft())
    return wavs


def warmup_serving(model, audio, max_batch: int = 32,
                   token_buckets: Sequence[int] = (32, 64, 96, 128),
                   frame_buckets: Sequence[int] = (128, 256, 384),
                   n_iter: int = None, vocoder=None,
                   include_ragged_batches: bool = True,
                   mesh=None) -> int:
    """Precompile the serving executable menu so no request ever compiles.

    Runs one tiny dummy call per (batch, n_tok, frames) combination through
    the encoder and the fused decode→waveform dispatch. With the persistent
    XLA compile cache enabled this is one-time work per machine. Returns the
    number of (batch, token, frame) shape combinations warmed.

    ``include_ragged_batches`` additionally warms the power-of-two batch
    buckets below ``max_batch`` (used by final chunks of short workloads).
    ``mesh``: warm the SPMD executables used by mesh-sharded serving.
    """
    n_data, params, voc_params = _prepare_mesh(model, vocoder, mesh)
    max_batch = _round_up(max_batch, n_data)
    batches = [max_batch]
    if include_ragged_batches:
        p = max(1, n_data)
        while p < max_batch:
            batches.append(p)
            p *= 2
    count = 0
    wav_dev = None
    for b in batches:
        for n_tok in token_buckets:
            tok = np.ones((b, n_tok), np.int32)
            features, durations, pitch, keep = model._encode_jit()(
                params, _place_tokens(tok, mesh, n_data))
            for frames in frame_buckets:
                wav_dev, _ = _dispatch_decode_wav(
                    model, audio, vocoder, n_iter, params, voc_params,
                    features, pitch, durations, np.float32(1.0), keep,
                    frames)
                count += 1
    if wav_dev is not None:
        # block on the last dispatch so "warm" means compiled AND executed
        np.asarray(wav_dev[0, :1])
    return count
