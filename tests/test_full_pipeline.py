"""End-to-end 5-stage pipeline on synthetic data:
create_training_data → train_aligner → extract_durations → train_tts →
predict. Exercises every CLI entry point with a tiny config.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent))

N_CLIPS = 10
SR = 22050


def _make_wavs(wav_dir: Path, meta_path: Path):
    wav_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    texts = ['hello world', 'a test', 'this is speech', 'more data now',
             'the quick fox', 'jumps over', 'sounds good', 'one two three',
             'testing audio', 'final clip']
    from scipy.io import wavfile
    for i in range(N_CLIPS):
        dur = rng.uniform(0.6, 1.2)
        t = np.arange(int(SR * dur)) / SR
        f0 = rng.uniform(120, 220)
        y = 0.4 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
        y += 0.01 * rng.standard_normal(len(t))
        wavfile.write(wav_dir / f'clip{i:02d}.wav', SR,
                      (y * 32767).astype(np.int16))
        lines.append(f'clip{i:02d}|raw|{texts[i]}')
    meta_path.write_text('\n'.join(lines) + '\n', encoding='utf-8')


def _tiny_config(tmp: Path) -> Path:
    with open(Path(__file__).parent.parent / 'config/training_config.yaml') as f:
        cfg = yaml.safe_load(f)
    cfg['paths'] = {
        'wav_directory': str(tmp / 'wavs'),
        'metadata_path': str(tmp / 'metadata.csv'),
        'log_directory': str(tmp / 'logs'),
        'train_data_directory': str(tmp / 'ttsdata'),
    }
    cfg['training_data_settings'].update({
        'n_test': 2, 'min_mel_len': 1, 'max_mel_len': 2000,
        'bucket_boundaries': [64, 128, 192],
        'bucket_batch_sizes': [4, 4, 4, 2],
        'val_bucket_batch_size': [2, 2, 2, 2],
    })
    cfg['text_settings']['model_breathing'] = False
    cfg['aligner_settings'].update({
        'decoder_model_dimension': 32, 'encoder_model_dimension': 32,
        'decoder_num_heads': [2, 2], 'encoder_num_heads': [2],
        'encoder_feed_forward_dimension': 32,
        'decoder_feed_forward_dimension': 32,
        'decoder_prenet_dimension': 32, 'encoder_prenet_dimension': 32,
        'encoder_max_position_encoding': 3000,
        'decoder_max_position_encoding': 10000,
        'reduction_factor_schedule': [[0, 1]],
        'max_steps': 3, 'validation_frequency': 2,
        'weights_save_frequency': 2, 'checkpoint_frequency': 2,
        'train_images_plotting_frequency': 2,
        'force_encoder_diagonal_steps': 1,
        'force_decoder_diagonal_steps': 2,
        'prediction_start_step': 1000, 'keep_n_weights': 2,
    })
    cfg['tts_settings'].update({
        'decoder_model_dimension': 32, 'encoder_model_dimension': 32,
        'decoder_num_heads': [2], 'encoder_num_heads': [2],
        'encoder_feed_forward_dimension': 32,
        'decoder_feed_forward_dimension': 32,
        'encoder_attention_conv_filters': [48, 32],
        'decoder_attention_conv_filters': [48, 32],
        'encoder_dense_blocks': 1, 'decoder_dense_blocks': 1,
        'duration_conv_filters': [16, 8], 'pitch_conv_filters': [16, 8],
        'compute_dtype': 'float32',
        'max_steps': 3, 'validation_frequency': 2,
        'weights_save_frequency': 2, 'weights_save_starting_step': 2,
        'checkpoint_frequency': 2, 'prediction_start_step': 1000,
        'keep_n_weights': 2,
    })
    path = tmp / 'session.yaml'
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope='module')
def pipeline_tmp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('pipeline')
    _make_wavs(tmp / 'wavs', tmp / 'metadata.csv')
    cfg = _tiny_config(tmp)
    return tmp, cfg


def test_stage1_create_training_data(pipeline_tmp):
    tmp, cfg = pipeline_tmp
    import create_training_data
    create_training_data.main(['--config', str(cfg), '--workers', '2'])
    from transformertts_tpu.utils.config import TrainingConfigManager
    cm = TrainingConfigManager(cfg)
    mels = list(cm.mel_dir.glob('*.npy'))
    pitches = list(cm.pitch_dir.glob('*.npy'))
    assert len(mels) == N_CLIPS and len(pitches) == N_CLIPS
    m = np.load(mels[0])
    p = np.load(Path(cm.pitch_dir) / mels[0].name)
    assert m.ndim == 2 and m.shape[1] == 80
    assert p.shape[0] == m.shape[0]
    assert (cm.data_dir / 'pitch_stats.pkl').exists()
    assert cm.train_metadata_path.exists() and cm.valid_metadata_path.exists()
    train = cm.train_metadata_path.read_text().strip().splitlines()
    valid = cm.valid_metadata_path.read_text().strip().splitlines()
    assert len(train) == N_CLIPS - 2 and len(valid) == 2


def test_stage2_train_aligner(pipeline_tmp):
    tmp, cfg = pipeline_tmp
    import train_aligner
    train_aligner.main(['--config', str(cfg), '--yes'])
    from transformertts_tpu.utils.config import TrainingConfigManager
    from transformertts_tpu.training import checkpointing
    cm = TrainingConfigManager(cfg, aligner=True)
    assert checkpointing.latest_checkpoint(cm.weights_dir) is not None
    # logs written
    assert any(cm.log_dir.rglob('events.out.tfevents.*'))


def test_stage3_extract_durations(pipeline_tmp):
    tmp, cfg = pipeline_tmp
    import extract_durations
    extract_durations.main(['--config', str(cfg)])
    from transformertts_tpu.utils.config import TrainingConfigManager
    cm = TrainingConfigManager(cfg, aligner=True)
    durs = list(cm.duration_dir.glob('*.npy'))
    pitches = list(cm.pitch_per_char.glob('*.npy'))
    assert len(durs) == N_CLIPS and len(pitches) == N_CLIPS
    # durations sum equals mel length; char pitch aligned with durations
    for f in durs:
        d = np.load(f)
        mel = np.load(cm.mel_dir / f.name)
        assert d.sum() == mel.shape[0]
        cp = np.load(cm.pitch_per_char / f.name)
        assert cp.shape == d.shape


def test_stage4_train_tts(pipeline_tmp):
    tmp, cfg = pipeline_tmp
    import train_tts
    train_tts.main(['--config', str(cfg), '--yes'])
    from transformertts_tpu.utils.config import TrainingConfigManager
    from transformertts_tpu.training import checkpointing
    cm = TrainingConfigManager(cfg, aligner=False)
    assert checkpointing.latest_checkpoint(cm.weights_dir) is not None
    # self-describing model dir saved at step 2
    assert (cm.base_dir / 'model_step_2' / 'config.yaml').exists()


def test_stage5_predict(pipeline_tmp):
    tmp, cfg = pipeline_tmp
    from transformertts_tpu.utils.config import TrainingConfigManager
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    cm = TrainingConfigManager(cfg, aligner=False)
    model = ForwardTransformer.load_model(cm.base_dir / 'model_step_2')
    out = model.predict('hello world', encode=True)
    assert out['mel'].ndim == 2 and out['mel'].shape[1] == 80


def test_stage4b_train_tts_resumes(pipeline_tmp):
    """Restart semantics: rerunning the same command resumes from the latest
    checkpoint (reference train_tts.py:121-131)."""
    tmp, cfg = pipeline_tmp
    import yaml
    with open(cfg) as f:
        full = yaml.safe_load(f)
    full['tts_settings']['max_steps'] = 5
    with open(cfg, 'w') as f:
        yaml.safe_dump(full, f)
    import train_tts
    train_tts.main(['--config', str(cfg), '--yes'])
    from transformertts_tpu.utils.config import TrainingConfigManager
    from transformertts_tpu.training import checkpointing
    cm = TrainingConfigManager(cfg, aligner=False)
    steps = [s for s, _ in checkpointing.list_checkpoints(cm.weights_dir)]
    assert max(steps) == 5
    # the resumed model dir reflects the continued run
    model = cm.load_model(verbose=False)
    assert model.step == 5
