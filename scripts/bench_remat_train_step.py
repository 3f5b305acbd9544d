"""A/B remat (rematerialisation) experiments on the training step.

If the step is HBM-bound (roofline_train_step.py), trading FLOPs for
activation traffic can REDUCE step time: `jax.checkpoint` makes backward
recompute a region instead of storing its internals between fwd and bwd.
Two candidate regions, measured independently at each published bucket:

  attention — recompute QK^T + f32 softmax in backward instead of storing
              the (B,H,Tq,Tk) weights (51 MB bf16/layer at B16x896f);
              q,k,v are dense-layer outputs that backward keeps anyway.
  cnnres    — recompute the 384->1536->384 conv stack of CNNResNorm in
              backward instead of storing the 1536-wide inner activation
              (~50 MB bf16/layer at B64x256f); costs ~1/3 extra conv FLOPs.

Each variant rebuilds the trainer so the jit cache can't leak between arms.

Run on the real chip:  python scripts/bench_remat_train_step.py [--iters 15]
"""
import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from measure_train_step import build, make_batch  # noqa: E402


def measure(iters, bucket, return_loss=False):
    model, trainer, state = build()
    rng = np.random.default_rng(0)
    n_frames, b, n_tok = bucket
    batch = make_batch(model, b, n_tok, n_frames, rng)
    dbatch = trainer.shard_batch(batch)
    s, aux = trainer.train_step(state, dbatch)
    first_loss = float(aux['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, aux = trainer.train_step(s, dbatch)
    float(aux['loss'])
    dt = (time.perf_counter() - t0) / iters * 1e3
    return (dt, first_loss) if return_loss else dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=15)
    ap.add_argument('--buckets', type=str, default='0,1,2')
    ap.add_argument('--tiny', action='store_true',
                    help='one tiny bucket — CPU smoke test of the wrappers')
    args = ap.parse_args()

    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from transformertts_tpu.nn import attention as attention_mod
    from transformertts_tpu.nn import blocks as blocks_mod

    buckets = [(256, 64, 48), (512, 32, 96), (896, 16, 160)]
    sel = [buckets[int(i)] for i in args.buckets.split(',')]
    if args.tiny:
        sel = [(32, 2, 12)]

    import jax.numpy as jnp

    orig_sdpa = attention_mod.scaled_dot_product_attention

    def remat_sdpa(q, k, v, mask, dropout_rate=0.0, rng=None,
                   deterministic=True):
        # close over the python-static args; checkpoint only the arrays.
        # dropout inside recomputes from the same rng -> identical mask.
        if mask is None:
            mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        if rng is None:
            fn = jax.checkpoint(
                lambda q_, k_, v_, m_: orig_sdpa(
                    q_, k_, v_, m_, dropout_rate, None, deterministic),
                policy=jax.checkpoint_policies.nothing_saveable)
            return fn(q, k, v, mask)
        fn = jax.checkpoint(
            lambda q_, k_, v_, m_, r_: orig_sdpa(
                q_, k_, v_, m_, dropout_rate, r_, deterministic),
            policy=jax.checkpoint_policies.nothing_saveable)
        return fn(q, k, v, mask, rng)

    orig_cnn_apply = blocks_mod.CNNResNorm.apply

    def remat_cnn_apply(self, params, x, rng=None, deterministic=True):
        if rng is None:
            fn = jax.checkpoint(
                lambda p_, x_: orig_cnn_apply(self, p_, x_, None,
                                              deterministic),
                policy=jax.checkpoint_policies.nothing_saveable)
            return fn(params, x)
        fn = jax.checkpoint(
            lambda p_, x_, r_: orig_cnn_apply(self, p_, x_, r_,
                                              deterministic),
            policy=jax.checkpoint_policies.nothing_saveable)
        return fn(params, x, rng)

    from transformertts_tpu.nn import core as core_mod

    orig_conv_apply = core_mod.Conv1D.apply

    def unfold_conv_apply(self, params, x):
        # k shifted copies concatenated channel-wise -> ONE (B,T,kC)@(kC,F)
        # GEMM; measured 198 TF/s fwd in isolation vs 167 for lax.conv
        # (scripts/bench_conv_formulations.py). SAME/stride-1 only (all the
        # model's convs). Matches XLA SAME alignment: pad (k-1)//2 low.
        if self.padding != 'SAME':
            return orig_conv_apply(self, params, x)
        ksz = self.kernel_size
        b, t, c = x.shape
        kcast = params['kernel'].astype(x.dtype)
        left = (ksz - 1) // 2
        xp = jnp.pad(x, ((0, 0), (left, ksz - 1 - left), (0, 0)))
        xcat = jnp.concatenate([xp[:, i:i + t] for i in range(ksz)], axis=-1)
        pet = jnp.float32 if x.dtype == jnp.float32 else None
        y = jax.lax.dot_general(
            xcat, kcast.reshape(ksz * c, -1),
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=core_mod.matmul_precision(x.dtype),
            preferred_element_type=pet)
        y = y + params['bias'].astype(y.dtype)
        return self.act(y).astype(x.dtype)

    results = {}
    for n_frames, b, n_tok in sel:
        key = f'B{b}x{n_frames}f'
        bucket = (n_frames, b, n_tok)
        base, base_loss = measure(args.iters, bucket, return_loss=True)
        print(f'{key:>12} base        : {base:7.2f} ms/step', flush=True)

        core_mod.Conv1D.apply = unfold_conv_apply
        r_unfold, unfold_loss = measure(args.iters, bucket, return_loss=True)
        core_mod.Conv1D.apply = orig_conv_apply
        # bf16 activations: GEMM-vs-conv f32 reassociation flips ~1-ulp
        # (0.4%) on some elements; tolerate <1% relative at the loss
        drift = abs(unfold_loss - base_loss)
        assert drift < 0.01 * abs(base_loss), \
            f'unfold-GEMM loss drift {drift} vs base {base_loss}'
        print(f'{key:>12} unfold conv : {r_unfold:7.2f} ms/step '
              f'(Δ {base - r_unfold:+.2f}, loss drift {drift:.2e})',
              flush=True)

        attention_mod.scaled_dot_product_attention = remat_sdpa
        r_attn = measure(args.iters, bucket)
        attention_mod.scaled_dot_product_attention = orig_sdpa
        print(f'{key:>12} remat attn  : {r_attn:7.2f} ms/step '
              f'(Δ {base - r_attn:+.2f})', flush=True)

        blocks_mod.CNNResNorm.apply = remat_cnn_apply
        r_cnn = measure(args.iters, bucket)
        blocks_mod.CNNResNorm.apply = orig_cnn_apply
        print(f'{key:>12} remat cnnres: {r_cnn:7.2f} ms/step '
              f'(Δ {base - r_cnn:+.2f})', flush=True)

        attention_mod.scaled_dot_product_attention = remat_sdpa
        blocks_mod.CNNResNorm.apply = remat_cnn_apply
        r_both = measure(args.iters, bucket)
        attention_mod.scaled_dot_product_attention = orig_sdpa
        blocks_mod.CNNResNorm.apply = orig_cnn_apply
        print(f'{key:>12} remat both  : {r_both:7.2f} ms/step '
              f'(Δ {base - r_both:+.2f})', flush=True)

        # flash kernel arm + its fair control: the kernel has no
        # attention-weight dropout, so compare it against the jnp path with
        # weight dropout forced off (out-projection dropout stays on in both)
        def nodrop_sdpa(q, k, v, mask, dropout_rate=0.0, rng=None,
                        deterministic=True):
            return orig_sdpa(q, k, v, mask, 0.0, None, True)

        attention_mod.scaled_dot_product_attention = nodrop_sdpa
        r_nodrop = measure(args.iters, bucket)
        print(f'{key:>12} jnp no-wdrop: {r_nodrop:7.2f} ms/step '
              f'(Δ {base - r_nodrop:+.2f})', flush=True)

        from transformertts_tpu.ops.flash_attention import (
            flash_attention_trainable)

        def flash_sdpa(q, k, v, mask, dropout_rate=0.0, rng=None,
                       deterministic=True):
            if mask is None:
                bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
            else:
                # framework mask: 1 = masked, broadcastable (B,1,1,Tk)
                bias = (mask.reshape(mask.shape[0], mask.shape[-1])
                        .astype(jnp.float32)) * -1e9
            out = flash_attention_trainable(q, k, v, bias)
            # weights are DCE'd in TTS training (return_attention=False)
            b, h, tq, _ = q.shape
            weights = jnp.zeros((b, h, tq, k.shape[2]), jnp.float32)
            return out, weights

        attention_mod.scaled_dot_product_attention = flash_sdpa
        r_flash = measure(args.iters, bucket)
        attention_mod.scaled_dot_product_attention = orig_sdpa
        print(f'{key:>12} flash kernel: {r_flash:7.2f} ms/step '
              f'(Δ vs no-wdrop {r_nodrop - r_flash:+.2f})', flush=True)

        results[key] = {'base': round(base, 3), 'remat_attn': round(r_attn, 3),
                        'remat_cnnres': round(r_cnn, 3),
                        'remat_both': round(r_both, 3),
                        'jnp_no_wdrop': round(r_nodrop, 3),
                        'flash': round(r_flash, 3),
                        'unfold_conv': round(r_unfold, 3)}

    import json
    print(json.dumps(results))


if __name__ == '__main__':
    main()
