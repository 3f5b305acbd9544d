"""Data pipeline: metadata readers, preprocessors, bucketed batcher, config
manager, checkpoint round-trip."""
import numpy as np
import pytest
import yaml

from transformertts_tpu.data.datasets import (AlignerDataset,
                                              AlignerPreprocessor,
                                              BucketedDataset, DataReader,
                                              TTSDataset, TTSPreprocessor)
from transformertts_tpu.data.metadata import (get_preprocessor_by_name,
                                              ljspeech, post_processed_reader)
from transformertts_tpu.text.tokenizer import Tokenizer

MEL = 8


def test_ljspeech_reader(tmp_path):
    meta = tmp_path / 'metadata.csv'
    meta.write_text('LJ001-0001|raw text|Normalized text.\n'
                    'LJ001-0002.wav|other|Another one!\n', encoding='utf-8')
    d = ljspeech(meta)
    assert d == {'LJ001-0001': 'Normalized text.',
                 'LJ001-0002': 'Another one!'}
    assert get_preprocessor_by_name('ljspeech') is ljspeech


def test_post_processed_reader_upsamples(tmp_path):
    meta = tmp_path / 'train.txt'
    meta.write_text('a|plain text\nb|excited text!\nc|question?\n',
                    encoding='utf-8')
    d, upsample = post_processed_reader(meta)
    assert len(d) == 3
    assert upsample.count('b') == 10 and upsample.count('c') == 10
    assert 'a' not in upsample


def _write_artifacts(tmp_path, names, mel_lens, with_tts=False):
    mel_dir = tmp_path / 'mels'
    mel_dir.mkdir()
    rng = np.random.default_rng(0)
    meta_lines = []
    for name, t in zip(names, mel_lens):
        np.save(mel_dir / f'{name}.npy', rng.standard_normal((t, MEL)))
        meta_lines.append(f'{name}|ab a b')
    meta = tmp_path / 'train_meta.txt'
    meta.write_text('\n'.join(meta_lines) + '\n', encoding='utf-8')
    extra = {}
    if with_tts:
        dur_dir = tmp_path / 'durs'
        pitch_dir = tmp_path / 'char_pitch'
        dur_dir.mkdir()
        pitch_dir.mkdir()
        for name, t in zip(names, mel_lens):
            n_tok = 6
            d = np.zeros(n_tok)
            d[:n_tok] = t // n_tok
            d[0] += t - d.sum()
            np.save(dur_dir / f'{name}.npy', d)
            np.save(pitch_dir / f'{name}.npy', rng.standard_normal(n_tok))
        extra = {'dur_dir': dur_dir, 'pitch_dir': pitch_dir}
    return mel_dir, meta, extra


def _reader(tmp_path, meta):
    return DataReader(wav_directory=tmp_path, metadata_path=meta,
                      metadata_reading_function=post_processed_reader,
                      training=True, is_processed=True)


def test_aligner_dataset_batches(tmp_path):
    names = [f's{i}' for i in range(7)]
    lens = [10, 12, 30, 33, 35, 60, 62]
    mel_dir, meta, _ = _write_artifacts(tmp_path, names, lens)
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=True,
                    model_breathing=False)
    prep = AlignerPreprocessor(MEL, 0.5, -0.5, tok)
    ds = AlignerDataset(_reader(tmp_path, meta), prep, mel_dir)
    data = ds.get_dataset(bucket_batch_sizes=[2, 2, 1],
                          bucket_boundaries=[20, 40], prefetch=0)
    batches = list(data.all_batches())
    total = sum(int((b['fname'] != '').sum()) for b in batches)
    assert total == 7
    for b in batches:
        assert b['mel'].ndim == 3 and b['mel'].shape[2] == MEL
        # mel frames padded to the bucket boundary (static shapes); overflow
        # clips land in one coarse OVERFLOW_PAD-multiple shape
        assert b['mel'].shape[1] in (20, 40, 256)
        assert b['stop_probs'].shape == b['mel'].shape[:2]
        # start/end vectors present on real samples
        real = b['fname'] != ''
        assert np.allclose(b['mel'][real][:, 0, :], 0.5)


def test_aligner_preprocessor_stop_targets():
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=True,
                    model_breathing=False)
    prep = AlignerPreprocessor(MEL, 0.5, -0.5, tok)
    s = prep(np.zeros((5, MEL)), 'ab', 'x')
    assert s['mel'].shape == (7, MEL)
    assert list(s['stop_probs'][:-1]) == [1] * 6
    assert s['stop_probs'][-1] == 2


def test_tts_dataset_batches(tmp_path):
    names = [f's{i}' for i in range(5)]
    lens = [12, 18, 24, 30, 36]
    mel_dir, meta, extra = _write_artifacts(tmp_path, names, lens,
                                            with_tts=True)
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=False,
                    model_breathing=False)
    prep = TTSPreprocessor(MEL, tok)
    ds = TTSDataset(_reader(tmp_path, meta), prep, mel_dir,
                    extra['dur_dir'], extra['pitch_dir'])
    data = ds.get_dataset(bucket_batch_sizes=[2, 2, 2],
                          bucket_boundaries=[16, 32], prefetch=0)
    batches = list(data.all_batches())
    total = sum(int((b['fname'] != '').sum()) for b in batches)
    assert total == 5
    for b in batches:
        assert b['durations'].shape == b['tokens'].shape
        assert b['pitch'].shape == b['tokens'].shape
        assert b['tokens'].shape[1] % 32 == 0


def test_bucketed_infinite_next_batch(tmp_path):
    names = [f's{i}' for i in range(3)]
    mel_dir, meta, _ = _write_artifacts(tmp_path, names, [10, 11, 12])
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=True,
                    model_breathing=False)
    prep = AlignerPreprocessor(MEL, 0.5, -0.5, tok)
    ds = AlignerDataset(_reader(tmp_path, meta), prep, mel_dir)
    data = ds.get_dataset(bucket_batch_sizes=[2, 1], bucket_boundaries=[20],
                          prefetch=0)
    seen = [data.next_batch() for _ in range(6)]  # cycles epochs
    assert all(b['mel'].shape[1] == 20 for b in seen)


def test_seeded_shuffle_is_reproducible(tmp_path):
    names = [f's{i}' for i in range(10)]
    mel_dir, meta, _ = _write_artifacts(tmp_path, names, [10] * 10)
    tok = Tokenizer(alphabet=list('ab c'), add_start_end=True,
                    model_breathing=False)
    prep = AlignerPreprocessor(MEL, 0.5, -0.5, tok)

    def order(seed):
        ds = AlignerDataset(_reader(tmp_path, meta), prep, mel_dir)
        data = ds.get_dataset(bucket_batch_sizes=[1, 1], bucket_boundaries=[20],
                              seed=seed, prefetch=0)
        return [b['fname'][0] for b in data.all_batches()]

    assert order(42) == order(42)
    assert order(42) != order(7)


def _write_session_config(tmp_path):
    import shutil
    cfg_path = tmp_path / 'session.yaml'
    with open('config/training_config.yaml') as f:
        cfg = yaml.safe_load(f)
    cfg['paths'] = {
        'wav_directory': str(tmp_path / 'wavs'),
        'metadata_path': str(tmp_path / 'metadata.csv'),
        'log_directory': str(tmp_path / 'logs'),
        'train_data_directory': str(tmp_path / 'ttsdata'),
    }
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def test_config_manager_sessions_and_dirs(tmp_path):
    cfg_path = _write_session_config(tmp_path)
    cm = __import__('transformertts_tpu.utils.config',
                    fromlist=['TrainingConfigManager']
                    ).TrainingConfigManager(cfg_path, aligner=False)
    assert cm.model_kind == 'tts'
    assert 'mel_channels' in cm.config          # audio section merged
    assert 'duration_conv_filters' in cm.config  # tts section merged
    assert 'reduction_factor_schedule' not in cm.config  # aligner not merged
    assert cm.session_names['tts'].startswith('tts_default.aligner_default')
    assert str(cm.mel_dir).endswith('mels.MelGAN_default')
    cm.create_remove_dirs(assume_yes=True)
    assert cm.mel_dir.exists() and cm.weights_dir.exists()
    cm.dump_config()
    assert (cm.base_dir / 'config.yaml').exists()

    cma = __import__('transformertts_tpu.utils.config',
                     fromlist=['TrainingConfigManager']
                     ).TrainingConfigManager(cfg_path, aligner=True)
    assert cma.max_r == 10
    assert cma.stop_scaling == 8


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from transformertts_tpu.training import checkpointing, make_optimizer
    from transformertts_tpu.training.state import init_state

    params = {'w': jnp.ones((4, 4)), 'b': {'x': jnp.zeros((4,))}}
    tx = make_optimizer([(0, 1e-3), (10, 1e-4)])
    state = init_state(params, tx, step=7)
    path = checkpointing.save_checkpoint(tmp_path, state)
    assert path.name == 'ckpt_7.npz'
    template = init_state(params, tx)
    restored = checkpointing.restore_latest(tmp_path, template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params['w']), 1.0)

    # retention: keep newest 2, retain multiples of keep_every
    for s in [10, 20, 25, 30]:
        checkpointing.save_checkpoint(
            tmp_path, state._replace(step=jnp.asarray(s)), keep_n=2,
            keep_every=20)
    steps = [s for s, _ in checkpointing.list_checkpoints(tmp_path)]
    assert 30 in steps and 25 in steps and 20 in steps
    assert 10 not in steps and 7 not in steps

    # regression: a torn '.tmp_ckpt_*.npz' left by a crash mid-save must
    # never be listed as a checkpoint (it previously matched the unanchored
    # regex and, having the highest step, shadowed the last good snapshot)
    (tmp_path / '.tmp_ckpt_99999.npz').write_bytes(b'torn partial write')
    steps = [s for s, _ in checkpointing.list_checkpoints(tmp_path)]
    assert 99999 not in steps
    restored = checkpointing.restore_latest(tmp_path, template)
    assert int(restored.step) == 30
    # and the next save sweeps stale tmp files
    checkpointing.save_checkpoint(
        tmp_path, state._replace(step=jnp.asarray(40)))
    assert not list(tmp_path.glob('.tmp_ckpt_*.npz'))


def test_config_manager_load_model_explicit_checkpoint(tmp_path):
    """cm.load_model(checkpoint_path=...) restores a specific snapshot."""
    import jax
    import jax.numpy as jnp
    from transformertts_tpu.training import checkpointing, make_optimizer
    from transformertts_tpu.training.state import init_state

    cfg_path = _write_session_config(tmp_path)
    cm = __import__('transformertts_tpu.utils.config',
                    fromlist=['TrainingConfigManager']
                    ).TrainingConfigManager(cfg_path, aligner=False)
    cm.create_remove_dirs(assume_yes=True)
    model = cm.get_model()
    params = model.init_params(jax.random.PRNGKey(1))
    tx = cm.get_optimizer()
    state = init_state(params, tx, step=123)
    path = checkpointing.save_checkpoint(cm.weights_dir, state)
    loaded = cm.load_model(checkpoint_path=path, verbose=False)
    assert loaded.step == 123
    np.testing.assert_array_equal(
        np.asarray(loaded.params['out']['bias']),
        np.asarray(params['out']['bias']))


def test_prefetch_propagates_worker_exception():
    """A failing load_fn (e.g. missing .npy) must raise in the consumer, not
    silently truncate the epoch as an early end-of-stream."""
    from transformertts_tpu.data.datasets import BucketedDataset

    def load_fn(name):
        if name == 'bad':
            raise FileNotFoundError('missing npy for ' + name)
        return {'mel': np.zeros((4, 2), np.float32), 'tokens': [1, 2],
                'fname': name}

    ds = BucketedDataset(['a', 'bad', 'c'], load_fn,
                         len_fn=lambda s: s['mel'].shape[0], mel_channels=2,
                         bucket_boundaries=[8], bucket_batch_sizes=[1, 1],
                         shuffle=False, prefetch=2)
    it = ds.all_batches()
    next(it)  # 'a' is fine
    with pytest.raises(FileNotFoundError):
        for _ in it:
            pass


def test_overflow_bucket_coarse_padding_bounds_shapes():
    """Out-of-range clips must share coarse overflow shapes (multiple of
    OVERFLOW_PAD), not mint one executable per unique length."""
    from transformertts_tpu.data.datasets import OVERFLOW_PAD, BucketedDataset

    lengths = {f's{i}': 100 + 7 * i for i in range(6)}  # all beyond boundary

    def load_fn(name):
        t = lengths[name]
        return {'mel': np.zeros((t, 2), np.float32), 'tokens': [1, 2, 3],
                'fname': name}

    ds = BucketedDataset(list(lengths), load_fn,
                         len_fn=lambda s: s['mel'].shape[0], mel_channels=2,
                         bucket_boundaries=[64], bucket_batch_sizes=[2, 1],
                         shuffle=False, prefetch=0)
    frame_shapes = {b['mel'].shape[1] for b in ds.all_batches()}
    assert all(f % OVERFLOW_PAD == 0 for f in frame_shapes)
    assert len(frame_shapes) == 1  # all six lengths collapse to one shape


def test_input_wait_instrumentation():
    """take_input_wait_ms: a slow loader accumulates stall time when the
    consumer outpaces it; the read resets the counter (VERDICT r2 item 9)."""
    import time
    from transformertts_tpu.data.datasets import BucketedDataset

    def slow_load(name):
        time.sleep(0.02)
        return {'mel': np.zeros((4, 2), np.float32), 'tokens': [1, 2],
                'fname': name}

    ds = BucketedDataset([f's{i}' for i in range(5)], slow_load,
                         len_fn=lambda s: s['mel'].shape[0], mel_channels=2,
                         bucket_boundaries=[8], bucket_batch_sizes=[1, 1],
                         shuffle=False, prefetch=1)
    for _ in ds.all_batches():
        pass
    waited = ds.take_input_wait_ms()
    assert waited > 0.0           # consumer must have blocked on the queue
    assert ds.take_input_wait_ms() == 0.0   # read resets


def test_input_wait_zero_when_loader_ahead():
    """A fast loader against a slow consumer reports ~no stall."""
    import time
    from transformertts_tpu.data.datasets import BucketedDataset

    def fast_load(name):
        return {'mel': np.zeros((4, 2), np.float32), 'tokens': [1, 2],
                'fname': name}

    ds = BucketedDataset([f's{i}' for i in range(5)], fast_load,
                         len_fn=lambda s: s['mel'].shape[0], mel_channels=2,
                         bucket_boundaries=[8], bucket_batch_sizes=[1, 1],
                         shuffle=False, prefetch=4)
    it = ds.all_batches()
    next(it)            # let the prefetcher fill while we sleep
    time.sleep(0.1)
    ds.take_input_wait_ms()       # discard startup wait for the first batch
    for _ in it:
        time.sleep(0.01)
    # generous margin: a loaded CI host can add a few ms of scheduling
    # latency per get(); a genuinely slow loader would be 100s of ms here
    assert ds.take_input_wait_ms() < 50.0
