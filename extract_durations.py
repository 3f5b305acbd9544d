"""Stage-3 CLI: extract phoneme durations + char-level pitch.

Capability parity with the reference extract_durations.py: load the trained
Aligner (requires r == 1), run teacher-forced validation over the full
phonemized dataset, extract per-phoneme durations from the
``Decoder_LastBlock_CrossAttention`` maps (batched DP on device,
ops/duration_extraction.py), save ``durations/{name}.npy``, log per-head
attention scores + extracted-alignment images, then average non-zero frame
pitch (with a >400 Hz outlier filter in de-normalized space) per phoneme
span into ``char_pitch/{name}.npy``.
"""
import multiprocessing
import pickle
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np
import tqdm

from transformertts_tpu.data.datasets import AlignerDataset, AlignerPreprocessor
from transformertts_tpu.ops.duration_extraction import get_durations_from_alignment
from transformertts_tpu.utils.config import TrainingConfigManager
from transformertts_tpu.utils.display import attention_grid_png
from transformertts_tpu.utils.logging_utils import SummaryManager
from transformertts_tpu.utils.scripts_utils import (basic_train_parser,
                                                    enable_compilation_cache)

LAST_LAYER_KEY = 'Decoder_LastBlock_CrossAttention'


def pitch_per_char(pitch: np.ndarray, durations: np.ndarray,
                   pitch_mean: float, pitch_std: float,
                   max_hz: float = 400.0) -> np.ndarray:
    """Mean of non-zero, non-outlier frame pitch per phoneme span
    (reference extract_durations.py:108-115)."""
    bounds = np.cumsum(np.concatenate([[0], durations])).astype(int)
    out = np.zeros(len(durations), np.float32)
    for i in range(len(durations)):
        seg = pitch[bounds[i]:bounds[i + 1]]
        seg = seg[seg != 0.0]
        seg = seg[(seg * pitch_std + pitch_mean) < max_hz]
        out[i] = seg.mean() if len(seg) else 0.0
    return out


def _char_pitch_job(args):
    name, pitch_dir, duration_dir, out_dir, mean, std = args
    pitch = np.load(f'{pitch_dir}/{name}.npy')
    durations = np.load(f'{duration_dir}/{name}.npy')
    np.save(f'{out_dir}/{name}.npy', pitch_per_char(pitch, durations, mean, std))
    return name


def main(argv=None):
    parser = basic_train_parser()
    parser.add_argument('--best', action='store_true',
                        help='use best head instead of weighted average')
    parser.add_argument('--autoregressive_weights', type=str, default=None,
                        help='explicit aligner checkpoint path')
    parser.add_argument('--skip_durations', action='store_true')
    parser.add_argument('--skip_char_pitch', action='store_true')
    args = parser.parse_args(argv)
    enable_compilation_cache()

    cm = TrainingConfigManager(args.config, aligner=True)
    cm.create_remove_dirs(assume_yes=True)
    config = cm.config

    if not args.skip_durations:
        model = cm.load_model(checkpoint_path=args.autoregressive_weights)
        assert model.r == 1, f'reduction factor must be 1, got {model.r}'
        # reference semantics (extract_durations.py:31): weighted head
        # average by default, best single head only with --best. (The
        # extract_attention_weighted config key exists in the reference yaml
        # but its CLI ignores it, so we do too.)
        weighted = not args.best

        tokenizer = model.text_pipeline.tokenizer
        prep = AlignerPreprocessor.from_config(cm, tokenizer)
        dataset = AlignerDataset.from_config(cm, prep, kind='phonemized')
        data = dataset.get_dataset(
            bucket_batch_sizes=config['val_bucket_batch_size'],
            bucket_boundaries=config['bucket_boundaries'], shuffle=False)

        summary_manager = SummaryManager(
            model, cm.log_dir / 'duration_extraction', config,
            default_writer='duration_extraction')
        trainer = cm.get_trainer(model)
        state = trainer.init_state(params=model.params, step=model.step)

        all_durations = []
        step = 0
        for batch in tqdm.tqdm(data.all_batches(), file=sys.stdout,
                               desc='extracting durations'):
            aux = trainer.val_step(state, batch, r=1)
            attn = np.asarray(aux['decoder_attention'][LAST_LAYER_KEY])
            real = batch['fname'] != ''
            n = int(real.sum())
            durations, final_align, jump, peak, diag = \
                get_durations_from_alignment(
                    attn[:n], batch['mel'][:n], batch['tokens'][:n],
                    weighted=weighted)
            for h in range(jump.shape[1]):
                summary_manager.add_scalar(
                    f'DurationExtraction/jumpiness_head{h}',
                    float(np.mean(jump[:n, h])), step)
                summary_manager.add_scalar(
                    f'DurationExtraction/peakiness_head{h}',
                    float(np.mean(peak[:n, h])), step)
                summary_manager.add_scalar(
                    f'DurationExtraction/diagonality_head{h}',
                    float(np.mean(diag[:n, h])), step)
            if step % 10 == 0 and n:
                summary_manager.add_image(
                    'DurationExtraction/alignment',
                    attention_grid_png(final_align[0][None, ...]), step)
            for i in range(n):
                name = batch['fname'][i]
                np.save(str(cm.duration_dir / f'{name}.npy'), durations[i])
                all_durations.append(durations[i])
            step += 1
        if all_durations:
            flat = np.concatenate(all_durations)
            flat = np.minimum(flat, 20)
            summary_manager.add_histogram('ExtractedDurations', flat, step)

    if not args.skip_char_pitch:
        from transformertts_tpu.data.datasets import DataReader
        reader = DataReader.from_config(cm, kind='phonemized')
        stats_path = cm.data_dir / 'pitch_stats.pkl'
        if stats_path.exists():
            with open(stats_path, 'rb') as f:
                stats = pickle.load(f)
        else:
            stats = {'pitch_mean': 0.0, 'pitch_std': 1.0}
        print(f'computing phoneme-wise pitch for {len(reader.filenames)} items')
        jobs = [(name, cm.pitch_dir, cm.duration_dir, cm.pitch_per_char,
                 stats['pitch_mean'], stats['pitch_std'])
                for name in reader.filenames]
        ctx = multiprocessing.get_context('spawn')  # fork deadlocks with JAX
        with ProcessPoolExecutor(mp_context=ctx) as ex:
            list(tqdm.tqdm(ex.map(_char_pitch_job, jobs, chunksize=16),
                           total=len(jobs), file=sys.stdout,
                           desc='char pitch'))
    print('Done.')


if __name__ == '__main__':
    main()
