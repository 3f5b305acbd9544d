import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformertts_tpu.nn import core, blocks, masks, posenc, attention
from transformertts_tpu.nn.length_regulator import regulate_length


def test_dense_shapes_and_activation():
    d = core.Dense(4, 8, activation='relu')
    p = d.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 3, 4))
    y = d.apply(p, x)
    assert y.shape == (2, 3, 8)
    assert (y >= 0).all()


def test_conv1d_same_padding_matches_numpy():
    c = core.Conv1D(2, 3, kernel_size=3)
    p = c.init(jax.random.PRNGKey(1))
    x = np.random.RandomState(0).randn(1, 5, 2).astype(np.float32)
    y = c.apply(p, jnp.asarray(x))
    assert y.shape == (1, 5, 3)
    # manual same-conv at position 2
    k = np.asarray(p['kernel'])
    expected = sum(x[0, 1 + i] @ k[i] for i in range(3)) + np.asarray(p['bias'])
    np.testing.assert_allclose(np.asarray(y[0, 2]), expected, rtol=1e-5)


def test_layer_norm():
    ln = core.LayerNorm(8)
    p = ln.init(None)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8)) * 5 + 3
    y = ln.apply(p, x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, -1)), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, -1)), 1, atol=1e-2)


def test_positional_encoding_values():
    pe = posenc.positional_encoding(50, 16)
    assert pe.shape == (1, 50, 16)
    np.testing.assert_allclose(np.asarray(pe[0, 0]),
                               [0, 1] * 8, atol=1e-6)  # sin(0)=0, cos(0)=1
    # position 1, dim 0: sin(1)
    assert abs(float(pe[0, 1, 0]) - np.sin(1.0)) < 1e-6
    # must stay a HOST numpy array: a jnp table closed over by jitted
    # functions is re-fetched from the device at every first lowering per
    # process (measured 40-400 s through a remote TPU tunnel)
    assert isinstance(pe, np.ndarray) and not isinstance(pe, jnp.ndarray)


def test_masks():
    seq = jnp.array([[1, 2, 0, 0]])
    m = masks.encoder_padding_mask(seq)
    np.testing.assert_array_equal(np.asarray(m[0, 0, 0]), [0, 0, 1, 1])
    la = masks.look_ahead_mask(3)
    np.testing.assert_array_equal(np.asarray(la),
                                  [[0, 1, 1], [0, 0, 1], [0, 0, 0]])
    mel = jnp.zeros((1, 3, 4)).at[0, 0].set(1.0)
    mm = masks.mel_padding_mask(mel)
    np.testing.assert_array_equal(np.asarray(mm[0, 0, 0]), [0, 1, 1])


def test_attention_weights_sum_to_one_and_mask():
    mha = attention.MultiHeadAttention(8, 2, 0.0)
    p = mha.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8))
    mask = jnp.zeros((2, 1, 1, 5)).at[:, :, :, 3:].set(1.0)
    out, w = mha.apply(p, x, x, x, mask)
    assert out.shape == (2, 5, 8)
    assert w.shape == (2, 2, 5, 5)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-5)
    # masked keys get ~zero weight
    assert float(jnp.max(w[:, :, :, 3:])) < 1e-6


def test_attention_matches_torch_sdpa():
    """Cross-check the softmax(QK^T/sqrt(d))V core against torch."""
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(0)
    q = rs.randn(1, 2, 4, 8).astype(np.float32)
    k = rs.randn(1, 2, 6, 8).astype(np.float32)
    v = rs.randn(1, 2, 6, 8).astype(np.float32)
    out, _ = attention.scaled_dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None)
    t_out = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)


def test_self_attention_blocks_stack():
    sab = blocks.SelfAttentionBlocks(
        model_dim=16, feed_forward_dimension=32, num_heads=[2, 2],
        maximum_position_encoding=100, conv_filters=[32, 16], dropout_rate=0.1,
        dense_blocks=1, kernel_size=3, conv_activation='relu', name='Enc')
    p = sab.init(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 16))
    mask = jnp.zeros((2, 1, 1, 7))
    y, attn = sab.apply(p, x, mask, deterministic=True)
    assert y.shape == (2, 7, 16)
    assert 'Enc_DenseBlock1_SelfAttention' in attn
    assert 'Enc_ConvBlock1_SelfAttention' in attn


def test_cross_attention_blocks():
    cab = blocks.CrossAttentionBlocks(
        model_dim=16, feed_forward_dimension=32, num_heads=[2, 2, 1],
        maximum_position_encoding=100, dropout_rate=0.1, name='Decoder')
    p = cab.init(jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 16))
    enc = jax.random.normal(jax.random.PRNGKey(9), (2, 7, 16))
    la = masks.look_ahead_mask(5)[None, None]
    pad = jnp.zeros((2, 1, 1, 7))
    y, attn = cab.apply(p, x, enc, la, pad, deterministic=True)
    assert y.shape == (2, 5, 16)
    assert 'Decoder_LastBlock_CrossAttention' in attn
    assert attn['Decoder_LastBlock_CrossAttention'].shape == (2, 1, 5, 7)


def test_length_regulator_reference_example():
    """Golden test from the reference Expand docstring (model/layers.py:533-542)."""
    x = jnp.array([[[0.54710746, 0.8943467],
                    [0.7140938, 0.97968304],
                    [0.5347662, 0.15213418]]])
    durations = jnp.array([[1.0, 3.0, 2.0]])
    out, valid = regulate_length(x, durations, max_frames=8)
    expected = np.array([[0.54710746, 0.8943467],
                         [0.7140938, 0.97968304],
                         [0.7140938, 0.97968304],
                         [0.7140938, 0.97968304],
                         [0.5347662, 0.15213418],
                         [0.5347662, 0.15213418],
                         [0.0, 0.0],
                         [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid[0]),
                                  [1, 1, 1, 1, 1, 1, 0, 0])


def test_length_regulator_banker_rounding():
    # tf.round and jnp.round both round half to even: 0.5→0, 1.5→2, 2.5→2
    x = jnp.ones((1, 3, 2))
    out, valid = regulate_length(x, jnp.array([[0.5, 1.5, 2.5]]), max_frames=6)
    assert int(jnp.sum(valid)) == 4  # 0 + 2 + 2


def test_length_regulator_jit_static_shape():
    f = jax.jit(lambda x, d: regulate_length(x, d, max_frames=10))
    x = jnp.ones((2, 4, 3))
    d = jnp.array([[1., 2., 1., 1.], [2., 2., 2., 2.]])
    out, valid = f(x, d)
    assert out.shape == (2, 10, 3)
    np.testing.assert_array_equal(np.asarray(jnp.sum(valid, -1)), [5, 8])


def test_stat_predictor():
    sp = blocks.StatPredictor(16, [8, 8], 3, 'relu', 'relu', 0.1)
    p = sp.init(jax.random.PRNGKey(10))
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 5, 16))
    mask = jnp.ones((2, 5, 1)).at[1, 3:].set(0.0)
    y = sp.apply(p, x, mask, deterministic=True)
    assert y.shape == (2, 5, 1)
    assert float(jnp.sum(jnp.abs(y[1, 3:]))) == 0.0


def test_remat_attention_matches_plain_path():
    """The bf16 training path wraps sdpa in jax.checkpoint (recompute in
    backward); outputs AND gradients must match the plain implementation —
    same rng means an identical dropout mask."""
    key = jax.random.key(3, impl='rbg')
    kq, kk, kv, kd = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(kq, (2, 2, 16, 8), jnp.bfloat16)
    k = jax.random.normal(kk, (2, 2, 16, 8), jnp.bfloat16)
    v = jax.random.normal(kv, (2, 2, 16, 8), jnp.bfloat16)
    mask = jnp.zeros((2, 1, 1, 16), jnp.float32).at[:, :, :, 12:].set(1.0)

    def loss_public(args):
        q_, k_, v_ = args
        out, _ = attention.scaled_dot_product_attention(
            q_, k_, v_, mask, 0.5, key, deterministic=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_plain(args):
        q_, k_, v_ = args
        out, _ = attention._sdpa(q_, k_, v_, mask, 0.5, key,
                                 deterministic=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l1, g1 = jax.value_and_grad(loss_public)((q, k, v))
    l2, g2 = jax.value_and_grad(loss_plain)((q, k, v))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.02, atol=1e-3)


def test_remat_gate_off_for_f32_and_inference():
    """f32 compute and deterministic paths must NOT hit jax.checkpoint
    (measured 11 ms/step regression on the f32 Aligner — see module doc)."""
    q = jnp.ones((1, 1, 4, 4), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda a: attention.scaled_dot_product_attention(
            a, a, a, None, 0.1, jax.random.key(0, impl='rbg'),
            deterministic=False)[0])(q)
    assert 'remat' not in str(jaxpr), 'f32 path must stay un-rematerialized'
    qb = q.astype(jnp.bfloat16)
    jaxpr_bf16 = jax.make_jaxpr(
        lambda a: attention.scaled_dot_product_attention(
            a, a, a, None, 0.1, jax.random.key(0, impl='rbg'),
            deterministic=False)[0])(qb)
    assert 'remat' in str(jaxpr_bf16), 'bf16 training path must rematerialize'


def test_bf16_numerator_boundary_matches_f32_softmax():
    """The bf16 path stores the UNNORMALIZED softmax numerator bf16 at the
    fusion boundary and folds the exact f32 denominator into the PV output
    ((w/denom)@V == (w@V)/denom, see _sdpa). Output must match a plain
    f32-softmax reference to bf16 resolution, and the returned normalized
    weights must be the exact f32 softmax (diagnostics/teacher contract)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (2, 2, 24, 16), jnp.bfloat16)
    k = jax.random.normal(kk, (2, 2, 24, 16), jnp.bfloat16)
    v = jax.random.normal(kv, (2, 2, 24, 16), jnp.bfloat16)
    mask = jnp.zeros((2, 1, 1, 24), jnp.float32).at[:, :, :, 20:].set(1.0)

    out, weights = attention._sdpa(q, k, v, mask, 0.0, None,
                                   deterministic=True)
    logits = jnp.einsum('bhqd,bhkd->bhqk',
                        q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits / jnp.sqrt(16.0) + mask * attention.NEG_INF
    w_ref = jax.nn.softmax(logits, axis=-1)
    out_ref = jnp.einsum('bhqk,bhkd->bhqd', w_ref, v.astype(jnp.float32))

    assert out.dtype == jnp.bfloat16
    assert weights.dtype == jnp.float32
    # weights: exact f32 softmax (bf16 only enters via the QK^T matmul)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(w_ref),
                               rtol=2e-2, atol=2e-3)
    # masked columns carry no weight
    assert float(jnp.max(weights[..., 20:])) < 1e-6
    # output: one bf16 rounding of the numerator ~ bf16 resolution
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_ref), rtol=0.05, atol=0.02)


def test_dropout_u16_semantics():
    """core.dropout draws 16 random bits per element (HBM traffic halved vs
    bernoulli's u32 path in the memory-bound train step). Pin the contract:
    drop fraction ~= rate (quantized to 1/65536), kept values scaled by the
    EXACT 1/(1-rate), identity when deterministic/rate==0, same key -> same
    mask, dtype preserved."""
    key = jax.random.PRNGKey(3)
    x = jnp.ones((512, 512), jnp.float32)
    for rate in (0.1, 0.5, 0.9):
        y = core.dropout(x, rate, key, deterministic=False)
        drop_frac = float((y == 0).mean())
        # binomial std at n=512*512 is ~1e-3; allow 5 sigma
        assert abs(drop_frac - rate) < 5e-3, (rate, drop_frac)
        kept = np.asarray(y)[np.asarray(y) != 0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    xr = jax.random.normal(key, (64, 64))
    assert (core.dropout(xr, 0.5, key, True) == xr).all()
    assert (core.dropout(xr, 0.0, key, False) == xr).all()
    a = core.dropout(xr, 0.3, key, False)
    b = core.dropout(xr, 0.3, key, False)
    assert (a == b).all()
    xb = xr.astype(jnp.bfloat16)
    assert core.dropout(xb, 0.3, key, False).dtype == jnp.bfloat16
    # rates below the u16 quantum round to the identity, not to an
    # accidental all-keep mask with a wrong scale
    tiny = core.dropout(xr, 1e-6, key, False)
    assert (tiny == xr).all()


def test_dropout_rate_one_returns_zeros():
    """rate >= 1.0 means drop everything: exact zeros, never an inf-tainted
    keep-scale (advisor finding, round 4)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 32))
    y = core.dropout(x, 1.0, key, deterministic=False)
    assert (np.asarray(y) == 0).all()
    assert np.isfinite(np.asarray(y)).all()


def test_f32_narrow_pv_weights_exact():
    """nn/attention.F32_NARROW_PV (the aligner's store-narrow/return-exact
    boundary): RETURNED attention weights are bit-identical to the default
    f32 path — duration extraction and the teacher losses see exactly the
    same maps — while the attention OUTPUT moves only by bf16 resolution."""
    from transformertts_tpu.nn import attention
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((2, 2, 24, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 24, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 24, 8)), jnp.float32)
    mask = jnp.zeros((2, 1, 1, 24)).at[:, :, :, 20:].set(1.0)
    assert not attention.F32_NARROW_PV  # default off
    # distinct wrapper lambdas: jax's trace cache is keyed on the callable,
    # and the flag is read at trace time
    o0, w0 = jax.jit(lambda *a: attention.scaled_dot_product_attention(*a))(
        q, k, v, mask)
    attention.F32_NARROW_PV = True
    try:
        o1, w1 = jax.jit(
            lambda *a: attention.scaled_dot_product_attention(*a))(
            q, k, v, mask)
    finally:
        attention.F32_NARROW_PV = False
    assert bool(jnp.all(w0 == w1))
    assert o1.dtype == jnp.float32
    scale = float(jnp.abs(o0).max())
    assert float(jnp.abs(o0 - o1).max()) < 0.02 * scale
