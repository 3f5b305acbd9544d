"""Jitted, mesh-sharded training step for the ForwardTransformer.

Capability parity with the reference train/val steps
(model/models.py:464-516): teacher-forced forward with target durations and
pitch, weighted masked-MAE losses [mel 1, duration 1, pitch 3], Adam update.

TPU-first design:
- one jitted SPMD step per (token-bucket, frame-bucket) shape; the LR schedule
  is computed on device from ``state.step`` (no host assign per step);
- the batch is sharded over the mesh 'data' axis and parameters are
  replicated, so XLA emits the gradient all-reduce over ICI — the TPU
  equivalent of DP-NCCL (SURVEY.md §2c);
- dropout RNG is folded from a base key and the step counter, giving
  reproducible multi-host-safe randomness.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from transformertts_tpu.training.base_trainer import (
    BaseTrainer, accumulate_grads, restack_accumulated_aux)
from transformertts_tpu.training.state import TrainState
from transformertts_tpu.utils.losses import (masked_mean_absolute_error,
                                             weighted_sum_losses)

LOSS_WEIGHTS = (1.0, 1.0, 3.0)  # mel, duration, pitch (reference models.py:485)


def forward_loss(model, params, batch: dict, rng, deterministic: bool):
    """Teacher-forced forward + weighted masked MAE losses."""
    tokens = batch['tokens']
    mel_target = batch['mel']
    dur_target = batch['durations'][..., None].astype(jnp.float32)
    pitch_target = batch['pitch'][..., None].astype(jnp.float32)
    max_frames = mel_target.shape[1]
    out = model.apply(params, tokens, max_frames,
                      target_durations=dur_target,
                      target_pitch=pitch_target,
                      rng=rng, deterministic=deterministic)
    # Duration/pitch targets can legitimately be zero (0-duration phonemes
    # from the DP, unvoiced pitch), so their mask must come from token
    # padding, not from nonzero-target inference — otherwise the model is
    # never supervised to predict 0 there (reference's duration/pitch MAE is
    # effectively unmasked, model/models.py:485).
    tok_mask = (tokens > 0).astype(jnp.float32)
    total, (l_mel, l_dur, l_pitch) = weighted_sum_losses(
        (mel_target, dur_target, pitch_target),
        (out['mel'], out['duration'], out['pitch']),
        (masked_mean_absolute_error,
         lambda t, p: masked_mean_absolute_error(t, p, mask=tok_mask),
         lambda t, p: masked_mean_absolute_error(t, p, mask=tok_mask)),
        LOSS_WEIGHTS)
    losses = {'loss': total, 'mel': l_mel, 'duration': l_dur, 'pitch': l_pitch}
    return total, (losses, out)


class ForwardTrainer(BaseTrainer):
    """Owns the optimizer, the mesh, and the compiled step functions."""

    def __init__(self, model, tx: optax.GradientTransformation,
                 mesh: Optional[Mesh] = None, base_rng_seed: int = 42,
                 return_attention: bool = False, grad_accumulation: int = 1):
        super().__init__(model, tx, mesh=mesh, base_rng_seed=base_rng_seed)
        self.return_attention = return_attention
        # N > 1: split each batch into N micro-batches, lax.scan the fwd+bwd
        # over them accumulating gradients, ONE Adam update on the mean.
        # Effective batch = N x what fits in HBM (the 896-frame bucket is
        # capacity-limited at B16 on one v5e), and optimizer/param traffic
        # (~2 GB/step at the published scale) is paid once per N
        # micro-batches. Losses are means of micro-batch losses (standard
        # grad-accumulation semantics; == the single-batch value when every
        # micro-batch has the same valid-element count).
        self.grad_accumulation = int(grad_accumulation)

    # ------------------------------------------------------------------ steps

    def _loss_and_grads(self, params, batch: dict, rng):
        (_, (losses, out)), grads = jax.value_and_grad(
            lambda p: forward_loss(self.model, p, batch, rng,
                                   deterministic=False), has_aux=True)(params)
        aux = dict(losses)
        aux['duration_pred'] = out['duration'][..., 0]
        if self.return_attention:
            aux['encoder_attention'] = out['encoder_attention']
            aux['decoder_attention'] = out['decoder_attention']
        return grads, aux

    def _train_step_impl(self, state: TrainState, batch: dict):
        rng = jax.random.fold_in(self.base_rng, state.step)
        n = self.grad_accumulation
        if n <= 1:
            grads, aux = self._loss_and_grads(state.params, batch, rng)
        else:
            grads, aux_st, b = accumulate_grads(
                self._loss_and_grads, state.params, batch, rng, n)
            aux = restack_accumulated_aux(aux_st, b)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, aux

    def _val_step_impl(self, state: TrainState, batch: dict):
        _, (losses, out) = forward_loss(self.model, state.params, batch,
                                        None, deterministic=True)
        aux = dict(losses)
        aux['mel_pred'] = out['mel']
        aux['duration_pred'] = out['duration'][..., 0]
        aux['pitch_pred'] = out['pitch'][..., 0]
        return aux

    # ------------------------------------------------------------------ API

    def train_step(self, state: TrainState, batch: dict):
        if self._train_step is None:
            self._build_steps(state)
        return self._train_step(state, self.shard_batch(batch))

    def val_step(self, state: TrainState, batch: dict):
        if self._val_step is None:
            self._build_steps(state)
        return self._val_step(state, self.shard_batch(batch))
