"""Decompose single-dispatch predict_wav latency through the device link.

BASELINE.md shows device p50 of 1–4 ms/utterance but 123–139 ms per single
dispatch through the axon tunnel (~25 ms RTT). This script accounts for the
difference leg by leg, so framework-caused overhead (extra uploads, multiple
result fetches) can be separated from link-caused overhead (RTT, bandwidth):

  1. rtt            — tiny jitted scalar round trip (dispatch + 1-scalar fetch)
  2. upload_tokens  — device_put of the token array, synced by a scalar fetch
  3. upload_two     — device_put of tokens AND the speed scalar separately
  4. dispatch_only  — full predict_wav computation with pre-device args,
                      fetching only the n_frames scalar
  5. fetch_wav_f32  — fetching a wav-sized float32 array alone
  6. fetch_wav_pcm16— fetching the same wav as int16 (half the bytes)
  7. fetch_all_sep  — wav + mel + n_frames as three sequential np.asarray
                      fetches (the round-2 predict_wav pattern)
  8. fetch_all_one  — the same three results via ONE jax.device_get call
  9. e2e_current    — model.predict_wav() end to end (what BASELINE.md shows)

Usage: python scripts/measure_dispatch_breakdown.py [--runs 30]
"""
import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

TEXT = ('President Trump met with other leaders at the group of '
        'twenty conference to discuss trade and security policy.')


def timed(fn, runs):
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(ts), 2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--runs', type=int, default=30)
    parser.add_argument('--max_frames', type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_model
    from transformertts_tpu.audio import Audio
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache

    enable_compilation_cache()
    model = build_model()
    audio = Audio(sampling_rate=22050, n_fft=1024, mel_channels=80,
                  hop_length=256, win_length=1024, f_min=0, f_max=8000,
                  normalizer='MelGAN')
    results = {}

    # ---- 1. pure RTT: tiny dispatch + scalar fetch ------------------------
    tiny = jax.jit(lambda x: x + 1)
    x0 = jax.device_put(jnp.float32(0))
    results['rtt_ms'] = timed(lambda: tiny(x0).item(), args.runs)

    # ---- prepare real args -------------------------------------------------
    tokens = np.asarray(model.encode_text(TEXT), np.int32)[None, :]
    n_pad = max(32, -(-tokens.shape[1] // 32) * 32)
    tokens = np.pad(tokens, ((0, 0), (0, n_pad - tokens.shape[1])))

    # ---- 2/3. upload cost ---------------------------------------------------
    # sync uploads by running a tiny jit that consumes them and fetching
    use_tok = jax.jit(lambda t: t.sum())

    def upload_tokens():
        d = jax.device_put(tokens)
        use_tok(d).item()
    results['upload_tokens_ms'] = timed(upload_tokens, args.runs)

    use_both = jax.jit(lambda t, s: t.sum() + s.astype(jnp.int32))

    def upload_two():
        d = jax.device_put(tokens)
        s = jax.device_put(np.float32(1.0))
        use_both(d, s).item()
    results['upload_two_ms'] = timed(upload_two, args.runs)

    # ---- 4. dispatch-only: pre-device args, scalar fetch --------------------
    fn = model._predict_wav_jit(audio, args.max_frames, 32)
    d_tok = jax.device_put(jnp.asarray(tokens))
    d_scalar = jax.device_put(jnp.float32(1.0))

    def dispatch_only():
        _, _, n = fn(model.params, d_tok, d_scalar)
        n.item()
    results['dispatch_only_ms'] = timed(dispatch_only, args.runs)

    # ---- 5/6. result-fetch cost by payload size -----------------------------
    wav_len = args.max_frames * audio.hop_length
    mk_f32 = jax.jit(lambda s: jnp.full((wav_len,), 0.1, jnp.float32) * s)
    mk_i16 = jax.jit(lambda s: (jnp.full((wav_len,), 0.1, jnp.float32)
                                * s * 32767).astype(jnp.int16))
    results['fetch_wav_f32_ms'] = timed(
        lambda: np.asarray(mk_f32(d_scalar)), args.runs)
    results['fetch_wav_pcm16_ms'] = timed(
        lambda: np.asarray(mk_i16(d_scalar)), args.runs)
    results['wav_bytes_f32'] = wav_len * 4

    # ---- 7/8. multi-result fetch granularity --------------------------------
    def fetch_all_sep():
        wav, mel, n = fn(model.params, d_tok, d_scalar)
        int(n)
        np.asarray(wav)
        np.asarray(mel)
    results['e2e_predevice_3fetch_ms'] = timed(fetch_all_sep, args.runs)

    def fetch_all_one():
        out = jax.device_get(fn(model.params, d_tok, d_scalar))
        _ = out[2]
    results['e2e_predevice_1fetch_ms'] = timed(fetch_all_one, args.runs)

    # ---- 9. current public path ---------------------------------------------
    results['e2e_predict_wav_ms'] = timed(
        lambda: model.predict_wav(TEXT, audio, max_frames=args.max_frames,
                                  n_iter=32), args.runs)

    for k, v in results.items():
        print(f'{k:28s} {v}')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
