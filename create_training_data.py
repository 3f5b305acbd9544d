"""Stage-1 CLI: dataset featurization (wav → mel/pitch) + phonemization.

Capability parity with the reference create_training_data.py: scans wavs and
metadata, per-clip preprocessing (resample → volume norm → VAD silence trim),
mel + frame-pitch extraction with length-agreement asserts, mel-length
filtering (min/max), corpus pitch mean/std normalization (zeros preserved)
saved to ``pitch_stats.pkl``, multiprocess phonemization, and the seeded
train/valid split written as pipe-separated metadata files.

TPU-first re-design: the reference runs librosa STFT+mel per clip in host
process pools; here clips are length-bucketed, host-reflect-padded (so the
batched result is **bit-identical** to per-clip centered STFT), and featurized
on device in batches — mel and YIN pitch each as one jitted call per bucket
shape. Host workers only do wav I/O and trimming.
"""
import argparse
import multiprocessing
import pickle
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from random import Random

import numpy as np
import tqdm

from transformertts_tpu.audio import Audio
from transformertts_tpu.data.datasets import DataReader
from transformertts_tpu.utils.config import TrainingConfigManager
from transformertts_tpu.utils.scripts_utils import enable_compilation_cache

WAV_BUCKET = 256 * 256  # wav lengths padded to multiples of this (≈3 s)


_AUDIO = None


def _init_worker(audio_config):
    global _AUDIO
    _AUDIO = Audio.from_config(audio_config)


def _load_and_trim(args):
    name, path = args
    try:
        y, _ = _AUDIO.load_wav(path, preprocess=True)
        return name, y.astype(np.float32)
    except Exception as e:
        print(f'skipping {name}: {e}', file=sys.stderr)
        return name, None


def featurize_batch(audio: Audio, names, wavs, mel_dir: Path, pitch_dir: Path,
                    min_len: int, max_len: int):
    """Device-batched mel+pitch for one bucket of clips. Returns kept names
    and raw pitch arrays (for later normalization)."""
    import jax.numpy as jnp
    from transformertts_tpu.audio.pitch import yin_f0

    hop = audio.hop_length
    n_fft = audio.n_fft
    lens = [len(w) for w in wavs]
    frames = [1 + l // hop for l in lens]
    # host reflect-pad (STFT center padding), then zero-pad to the bucket:
    # frames within the true range see exactly the per-clip samples
    target = -(-max(l + n_fft for l in lens) // WAV_BUCKET) * WAV_BUCKET
    centered = np.zeros((len(wavs), target), np.float32)
    plain = np.zeros((len(wavs), target), np.float32)
    for i, w in enumerate(wavs):
        c = np.pad(w, n_fft // 2, mode='reflect')
        centered[i, :len(c)] = c
        plain[i, :len(w)] = w
    mel = audio.log_mel_batch_centered(jnp.asarray(centered))
    import jax
    pitch = jax.vmap(lambda w: yin_f0(w, audio.sampling_rate, hop))(
        jnp.asarray(plain))
    mel = np.asarray(mel)
    pitch = np.asarray(pitch)

    kept, pitches = [], {}
    for i, name in enumerate(names):
        m = mel[i, :frames[i]]
        p = pitch[i, :frames[i]]
        assert m.shape[0] == p.shape[0], f'{m.shape} vs {p.shape}'
        if not (min_len <= m.shape[0] <= max_len):
            continue
        np.save(mel_dir / f'{name}.npy', m.astype(np.float32))
        np.save(pitch_dir / f'{name}.npy', p.astype(np.float32))
        kept.append(name)
        pitches[name] = p
    return kept, pitches


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    parser.add_argument('--skip_mels', action='store_true')
    parser.add_argument('--skip_phonemes', action='store_true')
    parser.add_argument('--workers', type=int, default=None)
    args = parser.parse_args(argv)
    enable_compilation_cache()

    # aligner kind, matching the reference CLI (create_training_data.py:26):
    # a data-prep config therefore only needs the aligner settings section.
    cm = TrainingConfigManager(args.config, aligner=True)
    cm.create_remove_dirs(assume_yes=True)
    config = cm.config
    audio = Audio.from_config(config)

    reader = DataReader.from_config(cm, kind='original', scan_wavs=True)
    names = [n for n in reader.filenames if n in reader.wav_paths]
    # sort by on-disk size (≈ duration, known without loading) so each
    # device featurization batch groups similar-length clips — arrival-order
    # groups pad every clip to the longest in the group
    names.sort(key=lambda n: reader.wav_paths[n].stat().st_size)
    print(f'{len(names)} wavs found')

    if not args.skip_mels:
        mel_dir, pitch_dir = cm.mel_dir, cm.pitch_dir
        kept_names = []
        all_pitch = {}
        # host workers load+trim; device featurizes in length-buckets
        batch = 16
        ctx = multiprocessing.get_context('spawn')  # fork deadlocks with JAX
        with ProcessPoolExecutor(max_workers=args.workers, mp_context=ctx,
                                 initializer=_init_worker,
                                 initargs=(audio.config,)) as ex:
            loaded = ex.map(_load_and_trim,
                            [(n, reader.wav_paths[n]) for n in names],
                            chunksize=8)
            pending = []
            for name, y in tqdm.tqdm(loaded, total=len(names),
                                     file=sys.stdout, desc='featurizing'):
                if y is None:
                    continue
                pending.append((name, y))
                if len(pending) == batch:
                    k, p = featurize_batch(
                        audio, [n for n, _ in pending],
                        [w for _, w in pending], mel_dir, pitch_dir,
                        int(config['min_mel_len']), int(config['max_mel_len']))
                    kept_names += k
                    all_pitch.update(p)
                    pending = []
            if pending:
                k, p = featurize_batch(
                    audio, [n for n, _ in pending], [w for _, w in pending],
                    mel_dir, pitch_dir, int(config['min_mel_len']),
                    int(config['max_mel_len']))
                kept_names += k
                all_pitch.update(p)

        # corpus pitch statistics over voiced frames; re-normalize in place
        voiced = np.concatenate([p[p > 0] for p in all_pitch.values()
                                 if (p > 0).any()]) if all_pitch else np.zeros(1)
        mean = float(voiced.mean()) if voiced.size else 0.0
        std = float(voiced.std()) if voiced.size else 1.0
        with open(cm.data_dir / 'pitch_stats.pkl', 'wb') as f:
            pickle.dump({'pitch_mean': mean, 'pitch_std': std}, f)
        for name, p in tqdm.tqdm(all_pitch.items(), file=sys.stdout,
                                 desc='normalizing pitch'):
            norm = np.where(p > 0, (p - mean) / std, 0.0)
            np.save(pitch_dir / f'{name}.npy', norm.astype(np.float32))
        print(f'kept {len(kept_names)}/{len(names)} clips; '
              f'pitch mean {mean:.1f} Hz, std {std:.1f}')
    else:
        kept_names = [p.stem for p in cm.mel_dir.glob('*.npy')]

    if not args.skip_phonemes:
        kept = [n for n in kept_names if n in reader.text_dict]
        texts = [reader.text_dict[n] for n in kept]
        print(f'phonemizing {len(texts)} texts')
        # single-process, batched-list call: the espeak backend batches all
        # clauses through chunked stdin invocations (threads inside) and the
        # builtin G2P runs ~1,000 clips/s — a spawn pool is 30× SLOWER here
        # because every worker re-imports the package (measured,
        # scripts/measure_featurization.py: 1,003 vs 31 clips/s at 1k clips)
        from transformertts_tpu.text.phonemizer import Phonemizer
        phonemizer = Phonemizer(language=config['phoneme_language'],
                                with_stress=config['with_stress'],
                                njobs=args.workers)
        phonemes = phonemizer(texts)

        with open(cm.phonemized_metadata_path, 'w', encoding='utf-8') as f:
            for n, ph in zip(kept, phonemes):
                f.write(f'{n}|{ph}\n')

        # seeded split (reference create_training_data.py:163-178)
        order = kept[:]
        Random(42).shuffle(order)
        n_test = int(config['n_test'])
        test_set = set(order[:n_test])
        ph_map = dict(zip(kept, phonemes))
        with open(cm.valid_metadata_path, 'w', encoding='utf-8') as f:
            for n in order[:n_test]:
                f.write(f'{n}|{ph_map[n]}\n')
        with open(cm.train_metadata_path, 'w', encoding='utf-8') as f:
            for n in order[n_test:]:
                f.write(f'{n}|{ph_map[n]}\n')
        assert len(test_set & set(order[n_test:])) == 0
        print(f'wrote {len(order) - n_test} train / {n_test} valid samples')
    print('Done.')


if __name__ == '__main__':
    main()
