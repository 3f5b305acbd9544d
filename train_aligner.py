"""Stage-2 CLI: Aligner (alignment teacher) training.

Capability parity with the reference train_aligner.py: per-step reduction-
factor and diagonal-forcing schedules, stop-token training, per-head
attention jumpiness/peakiness/diagonality diagnostics, rolling checkpoints
(latest every 1k + keep-n every save_freq), validation that also extracts
durations and logs audio snippets cut at extracted phoneme boundaries, and
periodic autoregressive text-to-audio predictions into TensorBoard.

TPU-first: changing (r, forcing flags) selects a cached compiled executable
(static jit args) instead of re-tracing; AR prediction runs as one on-device
while_loop with KV caches.
"""
import sys
from pathlib import Path

import numpy as np
import tqdm

from transformertts_tpu.audio import Audio
from transformertts_tpu.data.datasets import AlignerDataset, AlignerPreprocessor
from transformertts_tpu.ops.duration_extraction import get_durations_from_alignment
from transformertts_tpu.training import checkpointing
from transformertts_tpu.utils.config import TrainingConfigManager
from transformertts_tpu.utils.decorators import ignore_exception, time_it
from transformertts_tpu.utils.display import attention_grid_png, mel_png
from transformertts_tpu.utils.logging_utils import SummaryManager
from transformertts_tpu.utils.metrics import attention_score
from transformertts_tpu.utils.scheduling import (piecewise_linear_schedule,
                                                 reduction_schedule)
from transformertts_tpu.utils.scripts_utils import (basic_train_parser,
                                                    enable_compilation_cache,
                                                    print_devices)


def cut_with_durations(durations, wav, tokens_text, hop_length,
                       sampling_rate):
    """Audio snippets cut at extracted phoneme boundaries
    (reference train_aligner.py:23-33). Yields (symbol, snippet)."""
    starts = np.cumsum(np.concatenate([[0], durations[:-1]])) * hop_length
    ends = np.cumsum(durations) * hop_length
    for sym, s, e in zip(tokens_text, starts.astype(int), ends.astype(int)):
        yield sym, wav[s:e]


@ignore_exception
@time_it
def validate(trainer, state, val_dataset, summary_manager, step, r,
             audio: Audio, model):
    # validation always runs at r=1 so duration-extraction diagnostics are
    # available throughout training (reference train_aligner.py:44-45)
    r = 1
    total, norm = 0.0, 0
    last = None
    for batch in val_dataset.all_batches():
        aux = trainer.val_step(state, batch, r=r)
        total += float(aux['loss'])
        norm += 1
        last = (batch, aux)
    if not norm:
        return None
    summary_manager.add_scalar('Validation/loss', total / norm, step)
    batch, aux = last
    summary_manager.display_attention_heads(
        {'decoder_attention': {k: np.asarray(v)
                               for k, v in aux['decoder_attention'].items()},
         'encoder_attention': {k: np.asarray(v)
                               for k, v in aux['encoder_attention'].items()}},
        step, tag='ValidationAttention')
    # duration extraction diagnostics on the last batch
    n_real = int((batch['fname'] != '').sum())
    if n_real == 0:
        return total / norm
    attn = np.asarray(
        aux['decoder_attention']['Decoder_LastBlock_CrossAttention'])
    attn = attn[:n_real]  # drop batch/mesh padding rows
    durations, final_align, *_ = get_durations_from_alignment(
        attn, batch['mel'][:n_real], batch['tokens'][:n_real])
    idx = 0
    summary_manager.add_image(
        'ValidationAlignment/extracted',
        attention_grid_png(final_align[idx][None, ...]), step)
    # boundary-cut audio snippets of the first sample
    mel = batch['mel'][idx]
    n_frames = int((np.abs(mel).sum(-1) > 0).sum())
    wav = audio.reconstruct_waveform(mel[1:n_frames - 1].T)
    text = model.text_pipeline.tokenizer.decode(
        batch['tokens'][idx][1:len(durations[idx]) + 1])
    for i, (sym, snippet) in enumerate(cut_with_durations(
            durations[idx], wav, text, audio.hop_length,
            audio.sampling_rate)):
        if i >= 4 or len(snippet) == 0:
            break
        summary_manager.add_audio(f'ValidationSnippets/{i}_{ord(sym[0])}',
                                  snippet, audio.sampling_rate, step)
    return total / norm


@ignore_exception
def predict_test_sentences(model, state, audio, summary_manager, config, step):
    path = Path(config.get('test_sentences_file',
                           'config/aligner_test_sentences.txt'))
    if not path.exists():
        path = Path('config/aligner_test_sentences.txt')
    if not path.exists():
        return
    model.params = state.params
    for i, text in enumerate(path.read_text().splitlines()):
        if not text.strip():
            continue
        out = model.predict(text, max_length=int(
            config.get('prediction_max_length', 1000)))
        if out['mel'].shape[0] < 2:
            continue
        summary_manager.add_image(f'TestSentences/{i}_mel',
                                  mel_png(out['mel']), step)
        summary_manager.display_audio(f'TestSentences/{i}_wav', out['mel'],
                                      step)


def main(argv=None):
    parser = basic_train_parser()
    args = parser.parse_args(argv)
    enable_compilation_cache()
    print_devices()

    cm = TrainingConfigManager(args.config, aligner=True)
    cm.create_remove_dirs(clear_dir=args.reset_dir, clear_logs=args.reset_logs,
                          clear_weights=args.reset_weights, assume_yes=args.yes)
    cm.dump_config()
    cm.print_config()
    config = cm.config

    model = cm.get_model()
    trainer = cm.get_trainer(model)
    import jax
    state = trainer.init_state(jax.random.PRNGKey(42))
    restored = checkpointing.restore_latest(cm.weights_dir, state)
    if restored is not None:
        state = restored
        print(f'resumed from step {int(restored.step)}')

    tokenizer = model.text_pipeline.tokenizer
    prep = AlignerPreprocessor.from_config(cm, tokenizer)
    train_data = AlignerDataset.from_config(cm, prep, kind='train').get_dataset(
        bucket_batch_sizes=config['bucket_batch_sizes'],
        bucket_boundaries=config['bucket_boundaries'])
    val_data = AlignerDataset.from_config(cm, prep, kind='valid').get_dataset(
        bucket_batch_sizes=config['val_bucket_batch_size'],
        bucket_boundaries=config['bucket_boundaries'], shuffle=False)

    audio = Audio.from_config(config)
    summary_manager = SummaryManager(model, cm.log_dir, config, audio=audio)

    max_steps = int(config['max_steps'])
    val_freq = int(config['validation_frequency'])
    save_freq = int(config['weights_save_frequency'])
    plot_freq = int(config.get('train_images_plotting_frequency', 1000))
    pred_freq = int(config.get('prediction_frequency', val_freq))
    pred_start = int(config.get('prediction_start_step', 0))
    ckpt_freq = int(config.get('checkpoint_frequency', 1000))
    force_enc_steps = int(config.get('force_encoder_diagonal_steps', 0))
    force_dec_steps = int(config.get('force_decoder_diagonal_steps', 0))

    profile_start = int(config.get('profile_start_step', -1))
    profile_n = int(config.get('profile_n_steps', 10))
    import time as _time
    t = tqdm.trange(int(state.step), max_steps, initial=int(state.step),
                    total=max_steps, file=sys.stdout)
    py_step = int(state.step)  # host-side step mirror (no per-step device sync)
    for _ in t:
        step = py_step
        if step == profile_start:
            import jax.profiler
            jax.profiler.start_trace(str(cm.log_dir / 'profile'))
        _t0 = _time.perf_counter()
        r = reduction_schedule(step, config['reduction_factor_schedule'])
        model.set_constants(reduction_factor=r)
        batch = train_data.next_batch()
        plot_step = (step + 1) % plot_freq == 0
        state, aux = trainer.train_step(
            state, batch, r=r,
            force_encoder_diagonal=step < force_enc_steps,
            force_decoder_diagonal=step < force_dec_steps,
            return_attention=plot_step)
        py_step += 1
        step = py_step
        summary_manager.add_scalar('Meta/iter_time',
                                   _time.perf_counter() - _t0, step)
        summary_manager.add_scalar('Meta/input_wait_ms',
                                   train_data.take_input_wait_ms(), step)
        if profile_start >= 0 and step == profile_start + profile_n:
            import jax.profiler
            jax.profiler.stop_trace()
        t.set_postfix(loss=float(aux['loss']), r=r)

        summary_manager.display_loss(
            {k: v for k, v in aux.items()
             if k in ('loss', 'mel', 'stop_prob', 'diag_loss')}, step)
        summary_manager.add_scalar('Meta/reduction_factor', r, step)
        summary_manager.add_scalar(
            'Meta/learning_rate',
            float(piecewise_linear_schedule(step,
                                            config['learning_rate_schedule'])),
            step)

        if plot_step:
            mel_len = np.sum((np.abs(batch['mel']).sum(-1) > 0), axis=-1)
            phon_len = np.sum(batch['tokens'] != 0, axis=-1)
            # drop zero-padded rows from BOTH sources of padding — the
            # ragged-bucket collation and the mesh multiple — or their
            # 0-length samples blow diagonality up to ~1/eps in the logs
            real = (mel_len > 0) & (phon_len > 0)
            for name, attn in aux['decoder_attention'].items():
                attn = np.asarray(attn)[:len(mel_len)][real]
                loc, peak, diag = attention_score(
                    attn, np.asarray(mel_len[real] // r),
                    np.asarray(phon_len[real]), r=1)
                summary_manager.add_scalar(
                    f'AttentionJumpiness/{name}', float(np.mean(loc)), step)
                summary_manager.add_scalar(
                    f'AttentionPeakiness/{name}', float(np.mean(peak)), step)
                summary_manager.add_scalar(
                    f'AttentionDiagonality/{name}', float(np.mean(diag)), step)
            summary_manager.display_attention_heads(
                {'decoder_attention': {k: np.asarray(v) for k, v
                                       in aux['decoder_attention'].items()}},
                step, tag='TrainAttention')

        if step % ckpt_freq == 0:
            checkpointing.save_checkpoint(
                cm.weights_dir, state, keep_n=int(config['keep_n_weights']),
                keep_every=save_freq)
        if step % val_freq == 0:
            validate(trainer, state, val_data, summary_manager, step, r,
                     audio, model)
        if step % pred_freq == 0 and step >= pred_start:
            predict_test_sentences(model, state, audio, summary_manager,
                                   config, step)
    checkpointing.save_checkpoint(cm.weights_dir, state,
                                  keep_n=int(config['keep_n_weights']))
    print('done')


if __name__ == '__main__':
    main()
