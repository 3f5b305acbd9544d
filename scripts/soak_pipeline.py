"""End-to-end training soak: all five CLIs over a synthetic corpus.

Reproducible version of the round-1 ad-hoc soak (BASELINE.md "End-to-end
training soak"): builds a synthetic pseudo-speech corpus, then drives
create_training_data → train_aligner (in TWO processes with the config's
max_steps raised between them, proving checkpoint-resume across real
process restarts) → extract_durations → train_tts → predict_tts, asserting
health at every stage. Defaults are sized for ~10-20 min on one chip;
scale with the flags.

    python scripts/soak_pipeline.py --workdir /tmp/soak \
        --clips 200 --aligner_steps 1500 --tts_steps 1500
"""
import argparse
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent))

SR = 22050
WORDS = ('the quick brown fox jumps over a lazy dog near the river bank '
         'today while bright birds sing some songs about summer rain').split()


def make_corpus(wav_dir: Path, meta_path: Path, n_clips: int):
    from scipy.io import wavfile
    wav_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_clips):
        n_words = int(rng.integers(3, 9))
        text = ' '.join(rng.choice(WORDS, size=n_words))
        dur = 0.25 + 0.12 * n_words + float(rng.uniform(0, 0.2))
        t = np.arange(int(SR * dur)) / SR
        f0 = float(rng.uniform(110, 240))
        # vibrato + AM envelope + harmonics: structured enough for the
        # aligner to find a monotonic text-audio correspondence
        phase = 2 * np.pi * f0 * t + 0.5 * np.sin(2 * np.pi * 5 * t)
        y = (0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase)
             + 0.12 * np.sin(3 * phase))
        y *= 0.55 + 0.45 * np.sin(2 * np.pi * (2.0 + n_words / 4) * t)
        y += 0.01 * rng.standard_normal(len(t))
        wavfile.write(wav_dir / f'clip{i:04d}.wav', SR,
                      (np.clip(y, -1, 1) * 32767).astype(np.int16))
        lines.append(f'clip{i:04d}|raw|{text}')
    meta_path.write_text('\n'.join(lines) + '\n', encoding='utf-8')


def write_config(tmp: Path, args, aligner_max_steps: int) -> Path:
    with open(Path(__file__).parent.parent / 'config/training_config.yaml') as f:
        cfg = yaml.safe_load(f)
    cfg['paths'] = {
        'wav_directory': str(tmp / 'wavs'),
        'metadata_path': str(tmp / 'metadata.csv'),
        'log_directory': str(tmp / 'logs'),
        'train_data_directory': str(tmp / 'ttsdata'),
    }
    cfg['training_data_settings'].update({
        'n_test': max(4, args.clips // 20),
        'min_mel_len': 1, 'max_mel_len': 2000,
        'bucket_boundaries': [64, 128, 192, 256],
        'bucket_batch_sizes': [32, 16, 16, 8, 4],
        'val_bucket_batch_size': [4, 4, 4, 4, 4],
    })
    half = args.aligner_steps // 2
    a_freq = max(1, half // 3)
    cfg['aligner_settings'].update({
        'reduction_factor_schedule': [[0, 4], [half // 2, 2], [half, 1]],
        'max_steps': aligner_max_steps,
        'validation_frequency': a_freq,
        'weights_save_frequency': a_freq,
        'checkpoint_frequency': max(1, min(50, half)),
        'train_images_plotting_frequency': 1000000,
        'force_encoder_diagonal_steps': half // 4,
        'force_decoder_diagonal_steps': half // 2,
        'prediction_start_step': 10 ** 9,
        'keep_n_weights': 2,
    })
    t_freq = max(1, args.tts_steps // 3)
    cfg['tts_settings'].update({
        'max_steps': args.tts_steps,
        'validation_frequency': t_freq,
        'weights_save_frequency': t_freq,
        'weights_save_starting_step': t_freq,
        'checkpoint_frequency': max(1, min(50, args.tts_steps)),
        'prediction_start_step': 10 ** 9,
        'keep_n_weights': 2,
    })
    path = tmp / 'session.yaml'
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


def run_stage(name, fn):
    t0 = time.perf_counter()
    print(f'=== {name} ...', flush=True)
    fn()
    print(f'=== {name} done in {time.perf_counter() - t0:.0f}s', flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/tts_soak')
    p.add_argument('--clips', type=int, default=200)
    p.add_argument('--aligner_steps', type=int, default=1500)
    p.add_argument('--tts_steps', type=int, default=1500)
    args = p.parse_args()
    tmp = Path(args.workdir)
    tmp.mkdir(parents=True, exist_ok=True)
    root = Path(__file__).parent.parent

    if not (tmp / 'metadata.csv').exists():
        run_stage('corpus', lambda: make_corpus(
            tmp / 'wavs', tmp / 'metadata.csv', args.clips))

    import create_training_data
    import extract_durations
    import predict_tts
    import train_tts
    from transformertts_tpu.utils.config import TrainingConfigManager
    from transformertts_tpu.training import checkpointing

    # stage 1 (skipped when its outputs already exist — the soak is
    # stage-resumable so a flaky backend doesn't redo finished work)
    cfg = write_config(tmp, args, args.aligner_steps)
    cm_probe = TrainingConfigManager(cfg, aligner=True)
    if cm_probe.train_metadata_path.exists():
        print('=== stage1 create_training_data: already done, skipping',
              flush=True)
    else:
        run_stage('stage1 create_training_data',
                  lambda: create_training_data.main(['--config', str(cfg)]))

    # stage 2 as TWO real processes: segment 1 stops at half the steps,
    # segment 2 reruns the same command with full max_steps and must resume
    # from segment 1's checkpoint (restart semantics = rerun the command)
    def aligner():
        for seg, steps in ((1, args.aligner_steps // 2),
                           (2, args.aligner_steps)):
            write_config(tmp, args, steps)
            rc = subprocess.run(
                [sys.executable, str(root / 'train_aligner.py'),
                 '--config', str(cfg), '--yes'], timeout=7200).returncode
            assert rc == 0, f'aligner segment {seg} rc={rc}'
            cm = TrainingConfigManager(cfg, aligner=True)
            ck = checkpointing.latest_checkpoint(cm.weights_dir)
            assert ck is not None, f'no checkpoint after segment {seg}'
            print(f'aligner segment {seg}: checkpoint {Path(ck).name}',
                  flush=True)

    run_stage('stage2 train_aligner (2 processes, resume)', aligner)

    # stage 3
    run_stage('stage3 extract_durations',
              lambda: extract_durations.main(['--config', str(cfg)]))
    cm_a = TrainingConfigManager(cfg, aligner=True)
    durs = list(cm_a.duration_dir.glob('*.npy'))
    assert len(durs) >= args.clips * 0.8, f'durations missing: {len(durs)}'
    for f in durs[:20]:
        d = np.load(f)
        mel = np.load(cm_a.mel_dir / f.name)
        assert d.sum() == mel.shape[0], f'{f.name}: sum(dur) != mel len'
    print(f'durations: {len(durs)} clips, sum==mel_len verified on 20')

    # stage 4
    run_stage('stage4 train_tts',
              lambda: train_tts.main(['--config', str(cfg), '--yes']))
    cm_t = TrainingConfigManager(cfg, aligner=False)
    assert checkpointing.latest_checkpoint(cm_t.weights_dir) is not None

    # stage 5
    def predict():
        model_dirs = sorted(cm_t.base_dir.glob('model_step_*'),
                            key=lambda d: int(d.name.split('_')[-1]))
        assert model_dirs, 'no self-describing TTS weight dirs'
        outd = tmp / 'pred'
        predict_tts.main(['-p', str(model_dirs[-1]),
                          '-t', 'the quick brown fox jumps over a lazy dog',
                          '-o', str(outd)])
        wavs = list(outd.rglob('*.wav'))
        assert wavs, 'no wav produced'
        from scipy.io import wavfile
        sr, d = wavfile.read(wavs[0])
        assert sr == SR and d.size > 0 and np.abs(d).max() > 0
        if args.tts_steps >= 100:
            # an undertrained smoke model may predict near-zero durations;
            # require a real utterance length only at soak scale
            assert d.size > SR // 4, f'wav too short: {d.size} samples'
        print(f'predicted wav: {d.size / SR:.2f}s, peak {np.abs(d).max()}')

    run_stage('stage5 predict_tts', predict)
    print('SOAK OK', flush=True)


if __name__ == '__main__':
    main()
