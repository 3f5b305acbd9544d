"""System-level convergence check on a synthetic language (run manually or
via RUN_CONVERGENCE=1 pytest; excluded from the default suite for time).

Builds a deterministic token→mel "language": each token id has a fixed mel
signature and duration, so (a) the ForwardTransformer must drive its masked
mel loss near zero given target durations, and (b) the Aligner's
cross-attention must become strongly diagonal, yielding accurate extracted
durations. This validates the full learning stack (losses, optimizer,
sharded step, duration extraction) without a speech corpus.
"""
import numpy as np

MEL = 20
VOCAB_USED = 20


def make_language(rng, n_samples=64, n_tok=12, mel_channels=MEL):
    signatures = rng.standard_normal((VOCAB_USED + 1, mel_channels)) * 0.8
    durations_of = rng.integers(2, 6, VOCAB_USED + 1)
    samples = []
    for _ in range(n_samples):
        toks = rng.integers(1, VOCAB_USED + 1, n_tok)
        durs = np.asarray([durations_of[t] for t in toks], np.float32)
        frames = []
        for t, d in zip(toks, durs):
            block = np.tile(signatures[t], (int(d), 1))
            block += 0.01 * rng.standard_normal(block.shape)
            frames.append(block)
        mel = np.concatenate(frames, 0).astype(np.float32)
        samples.append((toks.astype(np.int32), durs, mel))
    return samples


def forward_convergence(steps=700, report_every=100):
    import jax
    from transformertts_tpu.models.forward_tts import ForwardTransformer
    from transformertts_tpu.training import ForwardTrainer, make_optimizer

    rng = np.random.default_rng(0)
    samples = make_language(rng)
    n_tok = 12
    t_max = max(s[2].shape[0] for s in samples)
    t_pad = -(-t_max // 16) * 16
    B = 16

    model = ForwardTransformer(
        encoder_model_dimension=64, decoder_model_dimension=64,
        dropout_rate=0.1, decoder_num_heads=[2], encoder_num_heads=[2],
        encoder_max_position_encoding=128,
        decoder_max_position_encoding=256,
        encoder_dense_blocks=1, decoder_dense_blocks=1,
        duration_conv_filters=[32, 16], pitch_conv_filters=[32, 16],
        duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
        mel_channels=MEL, phoneme_language='en-us', with_stress=False,
        model_breathing=False, encoder_feed_forward_dimension=64,
        decoder_feed_forward_dimension=64)
    model.init_params(jax.random.PRNGKey(0))
    trainer = ForwardTrainer(model, make_optimizer([(0, 3e-4), (10**6, 3e-4)]))
    state = trainer.init_state(params=model.params)

    def batch_of(idx):
        toks = np.zeros((len(idx), n_tok), np.int32)
        durs = np.zeros((len(idx), n_tok), np.float32)
        mel = np.zeros((len(idx), t_pad, MEL), np.float32)
        pitch = np.zeros((len(idx), n_tok), np.float32)
        for r_, i in enumerate(idx):
            t, d, m = samples[i]
            toks[r_], durs[r_] = t, d
            mel[r_, :m.shape[0]] = m
        return {'tokens': toks, 'durations': durs, 'mel': mel, 'pitch': pitch}

    losses = []
    for step in range(steps):
        idx = rng.integers(0, len(samples), B)
        state, aux = trainer.train_step(state, batch_of(idx))
        losses.append(float(aux['mel']))
        if (step + 1) % report_every == 0:
            print(f'forward step {step+1}: mel loss '
                  f'{np.mean(losses[-report_every:]):.4f}')
    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    print(f'forward mel loss {first:.3f} -> {last:.3f}')
    assert last < first * 0.25, 'forward model failed to learn the language'
    return model, state, samples


def aligner_convergence(steps=2500, report_every=500,
                        compute_dtype='float32', return_artifacts=False,
                        narrow_pv=True):
    import jax
    from transformertts_tpu.models.aligner import Aligner
    from transformertts_tpu.ops.duration_extraction import (
        get_durations_from_alignment)
    from transformertts_tpu.training import AlignerTrainer, make_optimizer
    from transformertts_tpu.utils.metrics import attention_score

    rng = np.random.default_rng(1)
    samples = make_language(rng, n_samples=48)
    n_tok = 12 + 2  # start/end tokens
    t_max = max(s[2].shape[0] for s in samples) + 2
    t_pad = -(-t_max // 16) * 16
    B = 16

    model = Aligner(
        compute_dtype=compute_dtype,
        encoder_model_dimension=48, decoder_model_dimension=48,
        encoder_num_heads=[2], decoder_num_heads=[2, 2],
        encoder_max_position_encoding=128, decoder_max_position_encoding=256,
        encoder_prenet_dimension=48, decoder_prenet_dimension=48,
        dropout_rate=0.1, mel_start_value=0.5, mel_end_value=-0.5,
        mel_channels=MEL, phoneme_language='en-us', with_stress=False,
        decoder_prenet_dropout=0.3, model_breathing=False,
        encoder_feed_forward_dimension=96, decoder_feed_forward_dimension=96,
        max_r=1)
    model.init_params(jax.random.PRNGKey(1))
    trainer = AlignerTrainer(model, make_optimizer([(0, 3e-4), (10**6, 3e-4)]),
                             narrow_pv=narrow_pv)
    state = trainer.init_state(params=model.params)

    start_id = model.text_pipeline.tokenizer.start_token_index
    end_id = model.text_pipeline.tokenizer.end_token_index

    def batch_of(idx):
        toks = np.zeros((len(idx), n_tok), np.int32)
        mel = np.zeros((len(idx), t_pad, MEL), np.float32)
        stop = np.zeros((len(idx), t_pad), np.int32)
        for r_, i in enumerate(idx):
            t, d, m = samples[i]
            toks[r_, 0] = start_id
            toks[r_, 1:1 + len(t)] = t
            toks[r_, 1 + len(t)] = end_id
            mel[r_, 0] = 0.5
            mel[r_, 1:1 + m.shape[0]] = m
            mel[r_, 1 + m.shape[0]] = -0.5
            stop[r_, :m.shape[0] + 1] = 1
            stop[r_, m.shape[0] + 1] = 2
        return {'tokens': toks, 'mel': mel, 'stop_probs': stop}

    for step in range(steps):
        idx = rng.integers(0, len(samples), B)
        state, aux = trainer.train_step(
            state, batch_of(idx), r=1,
            force_encoder_diagonal=step < 100,
            force_decoder_diagonal=step < 800)
        if (step + 1) % report_every == 0:
            print(f'aligner step {step+1}: loss {float(aux["loss"]):.4f}')

    # diagonality of the last cross-attention + extracted-duration accuracy
    batch = batch_of(np.arange(8))
    aux = trainer.val_step(state, batch, r=1)
    attn = np.asarray(
        aux['decoder_attention']['Decoder_LastBlock_CrossAttention'])[:8]
    # weighted=True is the CLI default (extract_durations.py, reference
    # semantics); convergence must hold under it
    durations, _, jump, peak, diag = get_durations_from_alignment(
        attn, batch['mel'][:8], batch['tokens'][:8], weighted=True)
    errs = []
    for i in range(8):
        true_d = samples[i][1]
        # extraction already drops the start/end columns: durations align
        # 1:1 with the real tokens
        got = durations[i].astype(np.float32)[:len(true_d)]
        errs.append(np.abs(got - true_d).mean())
    mean_err = float(np.mean(errs))
    print(f'extracted-duration MAE vs ground truth: {mean_err:.2f} frames '
          f'(mean true duration {np.mean([s[1].mean() for s in samples]):.2f})')
    assert mean_err < 1.5, 'extracted durations too far from ground truth'
    if return_artifacts:
        return {'duration_mae': mean_err, 'final_loss': float(aux['loss']),
                'model': model, 'state': state, 'samples': samples,
                'batch_of': batch_of, 'durations': durations}
    return mean_err


if __name__ == '__main__':
    forward_convergence()
    aligner_convergence()
    print('CONVERGENCE CHECK PASSED')


def test_convergence():  # pragma: no cover - run with RUN_CONVERGENCE=1
    import os
    import pytest
    if not os.environ.get('RUN_CONVERGENCE'):
        pytest.skip('set RUN_CONVERGENCE=1 to run the convergence check')
    forward_convergence()
    aligner_convergence()
