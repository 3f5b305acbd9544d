"""Stage-4 CLI: ForwardTransformer training.

Capability parity with the reference train_tts.py: bucketed TTS dataset over
preprocessed artifacts, per-step training with on-device LR schedule,
target-vs-predicted duration histograms per symbol, periodic validation with
free-running predictions (mel images + Griffin-Lim audio into TensorBoard),
rolling training checkpoints every ``weights_save_frequency`` plus
self-describing ``save_model`` dirs, and periodic synthesis of the test
sentences file.

TPU-first: the jitted train step is sharded over the device mesh (data
parallelism via NamedSharding; parallel/mesh.py) and batches have static
bucket shapes, so steady-state training reuses a handful of compiled
executables.
"""
import sys
from pathlib import Path

import numpy as np
import tqdm

from transformertts_tpu.audio import Audio
from transformertts_tpu.data.datasets import TTSDataset, TTSPreprocessor
from transformertts_tpu.training import checkpointing
from transformertts_tpu.training.state import init_state
from transformertts_tpu.utils.config import TrainingConfigManager
from transformertts_tpu.utils.decorators import ignore_exception, time_it
from transformertts_tpu.utils.display import mel_png
from transformertts_tpu.utils.logging_utils import SummaryManager
from transformertts_tpu.utils.scheduling import piecewise_linear_schedule
from transformertts_tpu.utils.scripts_utils import (basic_train_parser,
                                                    enable_compilation_cache,
                                                    print_devices)


@ignore_exception
@time_it
def validate(trainer, state, val_dataset, summary_manager, step):
    val_loss = {'loss': 0.0}
    norm = 0
    aux = None
    for batch in val_dataset.all_batches():
        aux = trainer.val_step(state, batch)
        val_loss['loss'] += float(aux['loss'])
        norm += 1
    if norm:
        val_loss['loss'] /= norm
        summary_manager.add_scalar('Validation/loss', val_loss['loss'], step)
    if aux is not None:
        real = batch['fname'] != ''
        if real.any():
            idx = int(np.argmax(real))
            pred_mel = np.asarray(aux['mel_pred'])[idx]
            target_mel = batch['mel'][idx]
            summary_manager.add_image('Validation/target_mel',
                                      mel_png(target_mel), step)
            summary_manager.add_image('Validation/pred_mel',
                                      mel_png(pred_mel), step)
            summary_manager.display_audio('Validation/target_wav', target_mel,
                                          step)
            summary_manager.display_audio('Validation/pred_wav', pred_mel, step)
    return val_loss['loss'] if norm else None


@ignore_exception
def log_duration_histograms(model, fname_durs, summary_manager, step):
    """Target vs predicted durations per phoneme symbol
    (reference train_tts.py:19-41)."""
    per_symbol_t, per_symbol_p = {}, {}
    rows = ((tokens, tgt, pred)
            for tokens_b, tgt_b, pred_b in fname_durs
            for tokens, tgt, pred in zip(tokens_b, tgt_b, pred_b))
    for tokens, tgt, pred in rows:
        for tok, t, p in zip(tokens, tgt, pred):
            if tok == 0:
                continue
            sym = model.text_pipeline.tokenizer.idx_to_token[int(tok)]
            per_symbol_t.setdefault(sym, []).append(float(t))
            per_symbol_p.setdefault(sym, []).append(float(p))
    for sym in per_symbol_t:
        safe = f'{ord(sym[0]):04x}' if not sym.isalnum() else sym
        summary_manager.add_histogram(f'DurationsTarget/{safe}',
                                      np.asarray(per_symbol_t[sym]), step)
        summary_manager.add_histogram(f'DurationsPredicted/{safe}',
                                      np.asarray(per_symbol_p[sym]), step)


@ignore_exception
def predict_test_sentences(model, state, audio, summary_manager, config, step):
    path = Path(config.get('test_sentences_file', 'config/test_sentences.txt'))
    if not path.exists():
        path = Path('config/test_sentences.txt')
    if not path.exists():
        return
    model.params = state.params
    for i, text in enumerate(path.read_text().splitlines()):
        if not text.strip():
            continue
        out = model.predict(text, encode=True)
        summary_manager.add_image(f'TestSentences/{i}_mel',
                                  mel_png(out['mel']), step)
        summary_manager.display_audio(f'TestSentences/{i}_wav', out['mel'],
                                      step)


def main(argv=None):
    parser = basic_train_parser()
    args = parser.parse_args(argv)
    enable_compilation_cache()
    print_devices()

    cm = TrainingConfigManager(args.config, aligner=False)
    cm.create_remove_dirs(clear_dir=args.reset_dir, clear_logs=args.reset_logs,
                          clear_weights=args.reset_weights,
                          assume_yes=args.yes)
    cm.dump_config()
    cm.print_config()
    config = cm.config

    model = cm.get_model()
    trainer = cm.get_trainer(model)
    import jax
    state = trainer.init_state(jax.random.PRNGKey(42))
    restored = checkpointing.restore_latest(cm.weights_dir, state)
    if restored is not None:
        # jit in_shardings re-places the restored pytree on the mesh
        state = restored
        print(f'resumed from step {int(restored.step)}')

    tokenizer = model.text_pipeline.tokenizer
    prep = TTSPreprocessor.from_config(cm, tokenizer)
    train_data = TTSDataset.from_config(cm, prep, kind='train').get_dataset(
        bucket_batch_sizes=config['bucket_batch_sizes'],
        bucket_boundaries=config['bucket_boundaries'])
    val_data = TTSDataset.from_config(cm, prep, kind='valid').get_dataset(
        bucket_batch_sizes=config['val_bucket_batch_size'],
        bucket_boundaries=config['bucket_boundaries'], shuffle=False)

    audio = Audio.from_config(config)
    summary_manager = SummaryManager(model, cm.log_dir, config, audio=audio)

    max_steps = int(config['max_steps'])
    val_freq = int(config['validation_frequency'])
    save_freq = int(config['weights_save_frequency'])
    save_start = int(config.get('weights_save_starting_step', 0))
    pred_freq = int(config.get('prediction_frequency', val_freq))
    pred_start = int(config.get('prediction_start_step', 0))
    ckpt_freq = int(config.get('checkpoint_frequency', 1000))

    fname_durs = []
    profile_start = int(config.get('profile_start_step', -1))
    profile_n = int(config.get('profile_n_steps', 10))
    import time as _time
    t = tqdm.trange(int(state.step), max_steps,
                    initial=int(state.step), total=max_steps,
                    file=sys.stdout)
    py_step = int(state.step)  # host-side mirror: avoids a device sync per
    # step (reading state.step blocks until the jitted step completes and
    # would serialize host dispatch against device execution)
    def log_step(step, aux, batch, iter_time):
        """Host-side logging for a completed step. Called one step late so
        fetching the loss scalars never blocks the device (the next step is
        already dispatched and running while this executes)."""
        summary_manager.add_scalar('Meta/iter_time', iter_time, step)
        summary_manager.add_scalar('Meta/input_wait_ms',
                                   train_data.take_input_wait_ms(), step)
        t.set_postfix(loss=float(aux['loss']))
        summary_manager.display_loss(
            {k: v for k, v in aux.items()
             if k in ('loss', 'mel', 'duration', 'pitch')}, step)
        summary_manager.add_scalar(
            'Meta/learning_rate',
            float(piecewise_linear_schedule(step,
                                            config['learning_rate_schedule'])),
            step)
        n_real = int((batch['fname'] != '').sum())
        fname_durs.append((batch['tokens'][:n_real],
                           batch['durations'][:n_real],
                           np.asarray(aux['duration_pred'])[:n_real]))
        if len(fname_durs) >= 100:
            log_duration_histograms(model, fname_durs, summary_manager, step)
            fname_durs.clear()

    pending = None
    for _ in t:
        if py_step == profile_start:
            import jax.profiler
            jax.profiler.start_trace(str(cm.log_dir / 'profile'))
        _t0 = _time.perf_counter()
        batch = train_data.next_batch()
        state, aux = trainer.train_step(state, batch)
        py_step += 1
        step = py_step
        if pending is not None:
            log_step(*pending)
        pending = (step, aux, batch, _time.perf_counter() - _t0)
        if profile_start >= 0 and step == profile_start + profile_n:
            import jax.profiler
            jax.profiler.stop_trace()

        if step % ckpt_freq == 0:
            checkpointing.save_checkpoint(
                cm.weights_dir, state, keep_n=int(config['keep_n_weights']))
        if step % save_freq == 0 and step >= save_start:
            model.params = jax.device_get(state.params)
            model.step = step
            model.save_model(cm.base_dir / f'model_step_{step}')
        if step % val_freq == 0:
            result = validate(trainer, state, val_data, summary_manager, step)
            if result is not None:
                _, elapsed = result
                summary_manager.add_scalar('Meta/validation_time', elapsed, step)
        if step % pred_freq == 0 and step >= pred_start:
            predict_test_sentences(model, state, audio, summary_manager,
                                   config, step)
    if pending is not None:
        log_step(*pending)
    checkpointing.save_checkpoint(cm.weights_dir, state,
                                  keep_n=int(config['keep_n_weights']))
    print('done')


if __name__ == '__main__':
    main()
