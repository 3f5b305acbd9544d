"""Losses: golden-value tests (porting the reference's test strategy,
tests/test_loss.py) plus mask semantics checks."""
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.utils.losses import (masked_crossentropy,
                                             masked_mean_absolute_error,
                                             masked_mean_squared_error,
                                             new_scaled_crossentropy,
                                             weighted_sum_losses)


def test_scaled_crossentropy_golden():
    # mirrors the reference golden test: class-2 upweighted by `scaling`
    targets = jnp.asarray([[0, 1, 2]], jnp.int32)
    logits = jnp.asarray([[[0.3, 0.1, 0.6], [0.2, 0.5, 0.3], [0.1, 0.1, 0.8]]])
    scaled = new_scaled_crossentropy(index=2, scaling=5.0)
    unscaled = new_scaled_crossentropy(index=2, scaling=1.0)
    l5 = float(scaled(targets, logits))
    l1 = float(unscaled(targets, logits))
    # padding (class 0) masked; class-2 term scaled by 5 increases the loss
    assert l5 > l1 > 0
    # hand-computed: positions 1,2 valid; CE from log_softmax
    logp = np.log(np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True))
    expected1 = (-logp[1, 1] - logp[2, 2]) / 2
    expected5 = (-logp[1, 1] - 5 * logp[2, 2]) / 2
    np.testing.assert_allclose(l1, expected1, rtol=1e-5)
    np.testing.assert_allclose(l5, expected5, rtol=1e-5)


def test_masked_crossentropy_ignores_padding():
    targets = jnp.asarray([[1, 0]], jnp.int32)
    logits = jnp.zeros((1, 2, 3))
    l = float(masked_crossentropy(targets, logits))
    np.testing.assert_allclose(l, -np.log(1 / 3), rtol=1e-5)


def test_masked_mae_masks_zero_frames():
    target = jnp.asarray([[[1.0, 2.0], [0.0, 0.0]]])  # frame 1 is padding
    pred = jnp.asarray([[[0.0, 0.0], [100.0, 100.0]]])
    l = float(masked_mean_absolute_error(target, pred))
    np.testing.assert_allclose(l, 1.5, rtol=1e-6)


def test_masked_mse_masks_zero_frames():
    target = jnp.asarray([[[2.0, 0.0], [0.0, 0.0]]])
    pred = jnp.asarray([[[0.0, 0.0], [9.0, 9.0]]])
    l = float(masked_mean_squared_error(target, pred))
    np.testing.assert_allclose(l, 2.0, rtol=1e-6)


def test_weighted_sum():
    f = lambda t, p: jnp.asarray(1.0)
    total, vals = weighted_sum_losses((1, 2), (1, 2), (f, f), (2.0, 3.0))
    assert float(total) == 5.0 and len(vals) == 2


def test_masked_mae_explicit_mask_supervises_zero_targets():
    """Duration/pitch heads pass an explicit token-padding mask so that
    legitimately-zero targets (0-duration phonemes, unvoiced pitch) still
    contribute loss — unlike the inferred nonzero-target mask."""
    targets = jnp.asarray([[2.0, 0.0, 0.0]])       # middle target is a real 0
    preds = jnp.asarray([[2.0, 5.0, 5.0]])
    tok_mask = jnp.asarray([[1.0, 1.0, 0.0]])      # last position is padding
    loss = float(masked_mean_absolute_error(targets, preds, mask=tok_mask))
    np.testing.assert_allclose(loss, (0.0 + 5.0) / 2.0, atol=1e-6)
    # inferred mask would have ignored the zero target entirely
    inferred = float(masked_mean_absolute_error(targets, preds))
    np.testing.assert_allclose(inferred, 0.0, atol=1e-6)


def test_forward_loss_duration_mask_from_tokens():
    """forward_loss must penalize wrong predictions at zero-duration
    positions inside the token mask."""
    from transformertts_tpu.training.forward_trainer import forward_loss

    class _FakeModel:
        def apply(self, params, tokens, max_frames, **kw):
            B, N = tokens.shape
            return {'mel': jnp.zeros((B, max_frames, 2)),
                    'duration': jnp.full((B, N, 1), 7.0),
                    'pitch': jnp.zeros((B, N, 1))}

    batch = {'tokens': jnp.asarray([[3, 4, 0, 0]]),
             'mel': jnp.zeros((1, 8, 2)),
             'durations': jnp.asarray([[5.0, 0.0, 0.0, 0.0]]),
             'pitch': jnp.zeros((1, 4))}
    total, (losses, _) = forward_loss(_FakeModel(), None, batch, None, True)
    # duration MAE over the 2 real tokens: (|5-7| + |0-7|) / 2 = 4.5
    np.testing.assert_allclose(float(losses['duration']), 4.5, atol=1e-6)
