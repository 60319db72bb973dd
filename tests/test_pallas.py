"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.ops.norms import conditional_instance_norm
from miseg_tpu.ops.pallas import (fused_conditional_instance_norm,
                                  fused_window_attention)


@pytest.fixture
def cin_case(rng):
    x = rng.standard_normal((2, 8, 8, 8, 16)).astype(np.float32)
    styles = np.array([0, 1], np.int32)
    gamma = rng.standard_normal((2, 16)).astype(np.float32) + 1.0
    beta = rng.standard_normal((2, 16)).astype(np.float32)
    return map(jnp.asarray, (x, styles, gamma, beta))


def test_fused_cin_matches_reference(cin_case):
    x, styles, gamma, beta = cin_case
    want = conditional_instance_norm(x, styles, gamma, beta)
    got = fused_conditional_instance_norm(x, styles, gamma, beta,
                                          interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_cin_with_leaky_relu(cin_case):
    x, styles, gamma, beta = cin_case
    want = jax.nn.leaky_relu(
        conditional_instance_norm(x, styles, gamma, beta), 0.01)
    got = fused_conditional_instance_norm(x, styles, gamma, beta,
                                          negative_slope=0.01, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_cin_gradients(cin_case):
    x, styles, gamma, beta = cin_case

    def loss_fused(x, g, b):
        y = fused_conditional_instance_norm(x, styles, g, b, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, g, b):
        y = conditional_instance_norm(x, styles, g, b)
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4), \
            (np.abs(np.asarray(a) - np.asarray(b_)).max())


def _jnp_window_attention(q, k, v, bias, ids, num_heads):
    from miseg_tpu.ops.window import mask_from_region_ids
    b, n, c = q.shape
    hd = c // num_heads
    qh = q.reshape(b, n, num_heads, hd)
    kh = k.reshape(b, n, num_heads, hd)
    vh = v.reshape(b, n, num_heads, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * (hd ** -0.5)
    attn = attn + bias[None]
    if ids is not None:
        mask = mask_from_region_ids(ids)
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, num_heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(b, n, c)


@pytest.fixture
def attn_case(rng):
    bw, n, c, h = 4, 27, 12, 3  # 3³ window
    mk = lambda: jnp.asarray(rng.standard_normal((bw, n, c)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32))
    # shifted-window mask as region ids [nW, N] (two tokens attend iff equal)
    ids = jnp.asarray(rng.integers(0, 3, (2, n)), jnp.int32)
    return q, k, v, bias, ids, h


def test_fused_attention_matches_reference(attn_case):
    q, k, v, bias, mask, h = attn_case
    want = _jnp_window_attention(q, k, v, bias, None, h)
    got = fused_window_attention(q, k, v, bias, None, num_heads=h,
                                 interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_attention_with_mask(attn_case):
    q, k, v, bias, mask, h = attn_case
    want = _jnp_window_attention(q, k, v, bias, mask, h)
    got = fused_window_attention(q, k, v, bias, mask, num_heads=h,
                                 interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_attention_gradients(attn_case):
    q, k, v, bias, mask, h = attn_case

    def loss(fn):
        def inner(q, k, v, bias):
            return jnp.sum(jnp.tanh(fn(q, k, v, bias)))
        return inner

    fused = loss(lambda *a: fused_window_attention(*a, mask, num_heads=h,
                                                   interpret=True))
    ref = loss(lambda *a: _jnp_window_attention(*a, mask, h))
    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


# ---- fused_instance_norm_act (merged lane-dense view) ----------------------

from miseg_tpu.ops.norms import instance_norm
from miseg_tpu.ops.pallas import fused_instance_norm_act
from miseg_tpu.ops.pallas.fused_norm import merge_view, supported


def test_merge_view():
    assert merge_view((1, 96, 96, 96, 48)) == (96 * 96, 96 * 48)
    assert merge_view((2, 8, 8, 8, 16)) == (64, 128)
    assert merge_view((1, 6, 6, 6, 768)) == (216, 768)
    assert merge_view((1, 7, 7, 7, 5)) is None  # 5*7*7*7 not %128
    assert supported((1, 96, 96, 96, 48))
    assert not supported((1, 7, 7, 7, 5))


def test_fused_norm_act_plain(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((16,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    want = instance_norm(x, g, b)
    got = fused_instance_norm_act(x, g, b, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # parameter-free (the swin proj_out path)
    want = instance_norm(x)
    got = fused_instance_norm_act(x, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_norm_act_conditional_with_tail(cin_case):
    x, styles, gamma, beta = cin_case
    add = jnp.asarray(np.random.default_rng(7).standard_normal(x.shape),
                      jnp.float32)
    want = jax.nn.leaky_relu(
        conditional_instance_norm(x, styles, gamma, beta) + add, 0.01)
    got = fused_instance_norm_act(x, gamma, beta, styles,
                                  negative_slope=0.01, add=add,
                                  interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_norm_act_gradients(cin_case):
    x, styles, gamma, beta = cin_case
    add = jnp.asarray(np.random.default_rng(9).standard_normal(x.shape),
                      jnp.float32)

    def loss_fused(x, g, b, a):
        y = fused_instance_norm_act(x, g, b, styles, negative_slope=0.01,
                                    add=a, interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, g, b, a):
        y = jax.nn.leaky_relu(
            conditional_instance_norm(x, styles, g, b) + a, 0.01)
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, gamma, beta, add)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, gamma, beta, add)
    for a_, b_ in zip(gf, gr):
        assert np.allclose(np.asarray(a_), np.asarray(b_), atol=1e-4), \
            (np.abs(np.asarray(a_) - np.asarray(b_)).max())


def test_fused_norm_act_plain_affine_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 32)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((32,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(jnp.cos(fused_instance_norm_act(
            x, g, b, negative_slope=0.2, interpret=True)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.cos(jax.nn.leaky_relu(instance_norm(x, g, b), 0.2)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a_, b_ in zip(gf, gr):
        assert np.allclose(np.asarray(a_), np.asarray(b_), atol=1e-4)


# ---- conv3_norm_stats (fused conv + affine-on-read + output stats) ---------

from miseg_tpu.ops.pallas.fused_conv import (conv3_norm_stats, norm_columns,
                                             supported as conv_supported)
from miseg_tpu.ops.pallas.fused_conv import _reference as _conv_reference


def test_conv_supported():
    assert conv_supported((1, 8, 8, 8, 4), 3, 1)
    assert not conv_supported((1, 8, 8, 4), 3, 1)        # 2D
    assert not conv_supported((1, 8, 8, 8, 4), 3, 2)     # strided
    assert not conv_supported((1, 8, 8, 8, 4), (3, 3, 1), 1)


@pytest.fixture
def conv_case(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 7)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal((2, 5)) + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((2, 5)), jnp.float32)
    return x, w, scale, shift


def test_conv3_matches_reference(conv_case):
    x, w, scale, shift = conv_case
    for sc, sh, sl in ((None, None, None), (scale, shift, None),
                       (scale, shift, 0.01)):
        y, s = conv3_norm_stats(x, w, sc, sh, slope=sl, interpret=True)
        yr, sr = _conv_reference(x, w, sc, sh, sl)
        assert np.allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
        assert np.allclose(np.asarray(s), np.asarray(sr), rtol=1e-5, atol=1e-2)


def test_conv3_gradients_through_norm(conv_case):
    """Gradient parity in the realistic composition: conv -> stats ->
    norm columns -> normalized output (well-conditioned in the stats)."""
    x, w, scale, shift = conv_case
    gamma = jnp.asarray(np.random.default_rng(5).standard_normal((2, 7)) + 1.0,
                        jnp.float32)
    beta = jnp.asarray(np.random.default_rng(6).standard_normal((2, 7)),
                       jnp.float32)
    styles = jnp.asarray([0, 1], jnp.int32)
    n = 6 * 8 * 8

    def loss(fn):
        def inner(x, w, sc, sh, g, b):
            y, s = fn(x, w, sc, sh)
            s2, h2 = norm_columns(s, n, g, b, styles)
            yn = y * s2[:, None, None, None, :] + h2[:, None, None, None, :]
            return jnp.sum(jnp.sin(yn))
        return inner

    lf = loss(lambda x, w, sc, sh: conv3_norm_stats(
        x, w, sc, sh, slope=0.01, interpret=True))
    lr = loss(lambda x, w, sc, sh: _conv_reference(x, w, sc, sh, 0.01))
    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4, 5))(x, w, scale, shift, gamma, beta)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4, 5))(x, w, scale, shift, gamma, beta)
    for a, b_ in zip(gf, gr):
        ref = np.abs(np.asarray(b_)).max()
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() < 1e-3 + 1e-3 * ref


def test_norm_columns_matches_instance_norm(rng):
    """columns(stats) applied to y == conditional_instance_norm(y)."""
    y = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 6)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((2, 6)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((2, 6)), jnp.float32)
    styles = jnp.asarray([1, 0], jnp.int32)
    s0 = jnp.sum(y, axis=(1, 2, 3))
    s1 = jnp.sum(y * y, axis=(1, 2, 3))
    stats = jnp.stack([s0, s1], 1)
    sc, sh = norm_columns(stats, 4 * 4 * 4, gamma, beta, styles)
    got = y * sc[:, None, None, None, :] + sh[:, None, None, None, :]
    want = conditional_instance_norm(y, styles, gamma, beta)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5)
