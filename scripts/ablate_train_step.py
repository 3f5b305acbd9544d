"""Subtractive profiling of the ForwardTransformer training step.

The xplane profile attributes time to fused ops, but a fusion's cost mixes
matmul, epilogue and layout work; ablating one component at a time and
re-measuring the whole step gives each component's TRUE marginal cost
including its fusion interactions. Each ablation keeps shapes and dataflow
identical (stubs produce same-shaped outputs from the same inputs) so the
rest of the program compiles the same way.

Ablations (cumulative column also printed):
  base       — unmodified step
  -dropout   — core.dropout → identity (cost of mask gen+apply)
  -layernorm — LayerNorm.apply → x * gamma + beta (cost of mean/var/rsqrt)
  -attention — scaled_dot_product_attention → uniform average over Tk
               (removes the QK^T/AV small-GEMMs + f32 softmax, keeps shapes)
  -adam      — optax.adam → sgd (cost of m/v state traffic)
  -pitch/dur — StatPredictor.apply → zeros (predictor conv towers)

Run on the real chip:  python scripts/ablate_train_step.py [--iters 15]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from measure_train_step import build, make_batch  # noqa: E402


def measure(trainer_state_batch, iters):
    trainer, state, dbatch = trainer_state_batch
    s, aux = trainer.train_step(state, dbatch)
    float(aux['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, aux = trainer.train_step(s, dbatch)
    float(aux['loss'])
    return (time.perf_counter() - t0) / iters * 1e3


def fresh(iters, bucket):
    """Build a fresh model/trainer/state and measure the CURRENT (possibly
    monkeypatched) step."""
    import jax
    model, trainer, state = build()
    rng = np.random.default_rng(0)
    n_frames, b, n_tok = bucket
    batch = make_batch(model, b, n_tok, n_frames, rng)
    dbatch = trainer.shard_batch(batch)
    return measure((trainer, state, dbatch), iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=15)
    ap.add_argument('--bucket', type=int, default=0)
    ap.add_argument('--tiny', action='store_true',
                    help='tiny shapes — CPU smoke test of the stubs')
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from transformertts_tpu.nn import attention as attention_mod
    from transformertts_tpu.nn import core
    import transformertts_tpu.training as training_pkg

    bucket = [(256, 64, 48), (512, 32, 96), (896, 16, 160)][args.bucket]
    if args.tiny:
        bucket = (32, 2, 12)

    results = {}
    results['base'] = fresh(args.iters, bucket)
    print(f'{"base":>11}: {results["base"]:7.2f} ms/step')

    # ---- -dropout ------------------------------------------------------
    orig_dropout = core.dropout
    core.dropout = lambda x, rate, rng, deterministic: x
    results['-dropout'] = fresh(args.iters, bucket)
    core.dropout = orig_dropout
    print(f'{"-dropout":>11}: {results["-dropout"]:7.2f} ms/step '
          f'(Δ {results["base"] - results["-dropout"]: .2f})')

    # ---- -layernorm ----------------------------------------------------
    orig_ln_apply = core.LayerNorm.apply

    def ln_stub(self, params, x):
        return (x.astype(jnp.float32) * params['gamma']
                + params['beta']).astype(x.dtype)

    core.LayerNorm.apply = ln_stub
    results['-layernorm'] = fresh(args.iters, bucket)
    core.LayerNorm.apply = orig_ln_apply
    print(f'{"-layernorm":>11}: {results["-layernorm"]:7.2f} ms/step '
          f'(Δ {results["base"] - results["-layernorm"]: .2f})')

    # ---- -attention ----------------------------------------------------
    orig_sdpa = attention_mod.scaled_dot_product_attention

    def sdpa_stub(q, k, v, mask, dropout_rate=0.0, rng=None,
                  deterministic=True):
        # same-shaped stand-in: uniform average over Tk, no QK^T / softmax
        out = jnp.broadcast_to(jnp.mean(v, axis=2, keepdims=True), q.shape)
        b, h, tq, _ = q.shape
        tk = k.shape[2]
        weights = jnp.full((b, h, tq, tk), 1.0 / tk, jnp.float32)
        return out, weights

    attention_mod.scaled_dot_product_attention = sdpa_stub
    results['-attention'] = fresh(args.iters, bucket)
    attention_mod.scaled_dot_product_attention = orig_sdpa
    print(f'{"-attention":>11}: {results["-attention"]:7.2f} ms/step '
          f'(Δ {results["base"] - results["-attention"]: .2f})')

    # ---- -adam ---------------------------------------------------------
    orig_make_opt = training_pkg.make_optimizer

    def sgd_opt(lr_points, **kw):
        return optax.sgd(1e-4)

    # build() does `from transformertts_tpu.training import make_optimizer`
    # at call time, so patching the package attribute is enough
    training_pkg.make_optimizer = sgd_opt
    results['-adam'] = fresh(args.iters, bucket)
    training_pkg.make_optimizer = orig_make_opt
    print(f'{"-adam":>11}: {results["-adam"]:7.2f} ms/step '
          f'(Δ {results["base"] - results["-adam"]: .2f})')

    # ---- -predictors ---------------------------------------------------
    from transformertts_tpu.nn import blocks as blocks_mod
    orig_sp_apply = blocks_mod.StatPredictor.apply

    def sp_stub(self, params, x, mask, rng=None, deterministic=True):
        return jnp.zeros(x.shape[:2] + (1,), jnp.float32)

    blocks_mod.StatPredictor.apply = sp_stub
    results['-predictors'] = fresh(args.iters, bucket)
    blocks_mod.StatPredictor.apply = orig_sp_apply
    print(f'{"-predictors":>11}: {results["-predictors"]:7.2f} ms/step '
          f'(Δ {results["base"] - results["-predictors"]: .2f})')

    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == '__main__':
    main()
