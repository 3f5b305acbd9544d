"""Jitted, mesh-sharded training step for the Aligner.

Capability parity with the reference GTA forward / train step
(model/models.py:169-227): shifted teacher forcing, r-strided decoder input,
masked-MAE mel loss + stop-token scaled crossentropy (stop_scaling=8), and
diagonal attention-forcing penalties during early training.

TPU-first: ``r`` and both diagonal-forcing flags are static jit arguments —
changing them on schedule selects a different cached executable (the
reference re-traces all tf.functions instead, models.py:229-245). The
diagonal masks are computed with the vectorized batch_diagonal_mask (no host
loop).

The aligner's attention traces with the store-narrow/return-exact PV
boundary ON by default (``narrow_pv=True`` → nn/attention.F32_NARROW_PV
inside this trainer's traces only): the PV matmul consumes a bf16 rounding
of the softmax numerator (single MXU pass instead of float32's multi-pass
HIGHEST emulation) while the returned attention maps — what the teacher
losses and duration extraction read — stay exact f32 softmax. Measured
(scripts/measure_aligner_narrow_pv.py, real v5e): 31.5/36.2/41.7 →
30.1/31.5/36.4 ms/step across the three buckets (−4.5/−13.0/−12.7%);
convergence equivalent and 100% same-weights duration agreement on the
synthetic ground-truth language. ``narrow_pv: false`` in aligner_settings
restores the plain f32 path.
"""
import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from transformertts_tpu.training.base_trainer import (
    BaseTrainer, accumulate_grads, restack_accumulated_aux)
from transformertts_tpu.training.state import TrainState
from transformertts_tpu.utils.losses import (masked_mean_absolute_error,
                                             new_scaled_crossentropy,
                                             weighted_sum_losses)
from transformertts_tpu.utils.metrics import batch_diagonal_mask

LOSS_WEIGHTS = (1.0, 1.0)  # mel, stop (reference models.py:223)


def aligner_loss(model, params, batch: dict, r: int, stop_loss,
                 force_encoder_diagonal: bool, force_decoder_diagonal: bool,
                 rng, deterministic: bool):
    """Shift → stride → forward → weighted losses (+ diagonal penalties)."""
    tokens = batch['tokens']
    mel = batch['mel']                       # (B, T, C) with start/end frames
    stop_probs = batch['stop_probs']         # (B, T) int {0 pad, 1 cont, 2 stop}
    tar_inp = mel[:, :-1]
    tar_real = mel[:, 1:]
    tar_stop = stop_probs[:, 1:]
    mel_len = tar_inp.shape[1]
    strided = tar_inp[:, ::r]
    out = model.apply(params, tokens, strided, r, rng, deterministic)
    total, (l_mel, l_stop) = weighted_sum_losses(
        (tar_real, tar_stop),
        (out['mel'][:, :mel_len], out['stop_prob'][:, :mel_len]),
        (masked_mean_absolute_error, stop_loss),
        LOSS_WEIGHTS)

    phon_len = jnp.sum(1.0 - jnp.squeeze(out['text_mask'], axis=(1, 2)), axis=1)
    # normalize per REAL sample: rows zero-padded onto the batch axis (mesh
    # divisibility padding) contribute 0 to the sum but must not inflate
    # the denominator, or the penalty weight would shrink with padding
    n_real = jnp.maximum(
        jnp.sum((jnp.sum(tokens != 0, axis=1) > 0).astype(jnp.float32)), 1.0)

    def diag_penalty(att, dmask):
        per_sample = jnp.sum(att * dmask, axis=(-2, -1))      # (B, H)
        return jnp.sum(per_sample) / (n_real * per_sample.shape[1]) / 10.0

    d_loss = jnp.float32(0.0)
    norm = 1.0
    if force_decoder_diagonal:
        dec_len = jnp.sum(1.0 - jnp.squeeze(out['mel_mask'], axis=(1, 2)), axis=1)
        maps = list(out['decoder_attention'].values())
        dmask = batch_diagonal_mask(maps[0].shape, dec_len, phon_len)
        for att in maps:
            d_loss += diag_penalty(att, dmask)
        norm += len(maps)
    if force_encoder_diagonal:
        maps = list(out['encoder_attention'].values())
        dmask = batch_diagonal_mask(maps[0].shape, phon_len, phon_len)
        for att in maps:
            d_loss += diag_penalty(att, dmask)
        norm += len(maps)
    d_loss = d_loss / norm
    total = total + d_loss
    losses = {'loss': total, 'mel': l_mel, 'stop_prob': l_stop,
              'diag_loss': d_loss}
    return total, (losses, out)


class AlignerTrainer(BaseTrainer):
    """Owns optimizer + mesh; compiles one step per (shape, r, flags)."""

    # (r, force_enc, force_dec[, return_attention]) select compiled variants
    train_static_argnums = (2, 3, 4, 5)
    val_static_argnums = (2, 3, 4)

    def __init__(self, model, tx: optax.GradientTransformation,
                 mesh: Optional[Mesh] = None, stop_scaling: float = 8.0,
                 base_rng_seed: int = 42, grad_accumulation: int = 1,
                 narrow_pv: bool = True):
        super().__init__(model, tx, mesh=mesh, base_rng_seed=base_rng_seed)
        self.stop_loss = new_scaled_crossentropy(index=2, scaling=stop_scaling)
        # see module docstring; applied per-trace via _attention_scope so the
        # process-global default (and e.g. f32 TTS parity paths traced later
        # in the same process) is never mutated
        self.narrow_pv = bool(narrow_pv)
        # N > 1: scan fwd+bwd over N micro-batches, one Adam update on the
        # mean gradient (same semantics as ForwardTrainer — the aligner
        # trains the same 896-frame buckets at r=1 where HBM capacity, not
        # compute, limits the batch). The r / diag-forcing static args apply
        # uniformly to every micro-batch of a step.
        self.grad_accumulation = int(grad_accumulation)

    # ------------------------------------------------------------------ steps

    @contextlib.contextmanager
    def _attention_scope(self):
        """Scope nn/attention.F32_NARROW_PV to THIS trace. The flag only
        affects graph construction, and a jitted function's Python body runs
        exactly once per trace — so set/restore inside the traced body
        applies the boundary to this trainer's executables and nothing
        else."""
        from transformertts_tpu.nn import attention
        old = attention.F32_NARROW_PV
        attention.F32_NARROW_PV = self.narrow_pv
        try:
            yield
        finally:
            attention.F32_NARROW_PV = old

    def _loss_and_grads(self, params, batch: dict, rng, r: int,
                        force_enc: bool, force_dec: bool,
                        return_attention: bool):
        (_, (losses, out)), grads = jax.value_and_grad(
            lambda p: aligner_loss(self.model, p, batch, r, self.stop_loss,
                                   force_enc, force_dec, rng,
                                   deterministic=False), has_aux=True)(params)
        aux = dict(losses)
        if return_attention:
            # attention maps are (B, H, T, T) per layer — hundreds of MB of
            # HBM writes per step; only materialize on diagnostic steps
            aux['decoder_attention'] = out['decoder_attention']
            aux['encoder_attention'] = out['encoder_attention']
            aux['text_mask'] = out['text_mask']
            aux['mel_mask'] = out['mel_mask']
        return grads, aux

    def _train_step_impl(self, state: TrainState, batch: dict, r: int,
                         force_enc: bool, force_dec: bool,
                         return_attention: bool):
        with self._attention_scope():
            return self._train_step_body(state, batch, r, force_enc,
                                         force_dec, return_attention)

    def _train_step_body(self, state: TrainState, batch: dict, r: int,
                         force_enc: bool, force_dec: bool,
                         return_attention: bool):
        rng = jax.random.fold_in(self.base_rng, state.step)
        n = self.grad_accumulation

        def lag(params, mb, mb_rng):
            return self._loss_and_grads(params, mb, mb_rng, r,
                                        force_enc, force_dec,
                                        return_attention)

        if n <= 1:
            grads, aux = lag(state.params, batch, rng)
        else:
            grads, aux_st, b = accumulate_grads(
                lag, state.params, batch, rng, n)
            aux = restack_accumulated_aux(aux_st, b)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, aux

    def _val_step_impl(self, state: TrainState, batch: dict, r: int,
                       force_enc: bool, force_dec: bool):
        with self._attention_scope():
            _, (losses, out) = aligner_loss(
                self.model, state.params, batch, r, self.stop_loss,
                force_enc, force_dec, None, deterministic=True)
        aux = dict(losses)
        aux['mel_pred'] = out['mel']
        aux['decoder_attention'] = out['decoder_attention']
        aux['encoder_attention'] = out['encoder_attention']
        aux['text_mask'] = out['text_mask']
        aux['mel_mask'] = out['mel_mask']
        return aux

    # ------------------------------------------------------------------ API

    def train_step(self, state: TrainState, batch: dict, r: int = None,
                   force_encoder_diagonal: bool = False,
                   force_decoder_diagonal: bool = False,
                   return_attention: bool = False):
        r = r if r is not None else self.model.r
        if self._train_step is None:
            self._build_steps(state)
        return self._train_step(state, self.shard_batch(batch), r,
                                force_encoder_diagonal, force_decoder_diagonal,
                                return_attention)

    def val_step(self, state: TrainState, batch: dict, r: int = None,
                 force_encoder_diagonal: bool = False,
                 force_decoder_diagonal: bool = False):
        r = r if r is not None else self.model.r
        if self._val_step is None:
            self._build_steps(state)
        return self._val_step(state, self.shard_batch(batch), r,
                              force_encoder_diagonal, force_decoder_diagonal)
