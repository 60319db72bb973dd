"""Unit tests for the normalization core.

Strategy per SURVEY.md §4: conditional norm is checked against a per-style
reference computation (the semantics of the reference's per-sample Python
loop, conditional_instance_norm.py:59-60), plain norms against numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.ops import norms as N
from miseg_tpu.nn.norms import Norm, make_norm


def _np_instance_norm(x, gamma=None, beta=None, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    if gamma is not None:
        y = y * gamma + beta
    return y


def test_instance_norm_matches_numpy(rng):
    x = rng.standard_normal((2, 5, 6, 7, 3)).astype(np.float32)
    g = rng.standard_normal(3).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    got = N.instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    want = _np_instance_norm(x, g, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conditional_instance_norm_per_style_reference(rng):
    """Vectorized gather must equal applying each style's affine per sample."""
    num_styles, c = 3, 4
    x = rng.standard_normal((5, 6, 7, c)).astype(np.float32)  # [B, H, W, C] (2d case)
    gamma = rng.standard_normal((num_styles, c)).astype(np.float32)
    beta = rng.standard_normal((num_styles, c)).astype(np.float32)
    styles = np.array([0, 2, 1, 0, 2], dtype=np.int32)
    got = N.conditional_instance_norm(jnp.asarray(x), jnp.asarray(styles),
                                      jnp.asarray(gamma), jnp.asarray(beta))
    # reference semantics: per-sample, apply the style's own instance norm
    want = np.stack([
        _np_instance_norm(x[i:i + 1], gamma[styles[i]], beta[styles[i]])[0]
        for i in range(len(styles))
    ])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_conditional_norm_lifts_swbatch_restriction(rng):
    """Broadcasting one modality over a window batch works (reference errored)."""
    x = rng.standard_normal((4, 5, 5, 5, 2)).astype(np.float32)
    styles = jnp.full((4,), 1, jnp.int32)  # same modality replicated over sw batch
    gamma = jnp.ones((2, 2))
    beta = jnp.zeros((2, 2))
    out = N.conditional_instance_norm(jnp.asarray(x), styles, gamma, beta)
    assert out.shape == x.shape


def test_layer_norm_matches_numpy(rng):
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    got = N.layer_norm(jnp.asarray(x))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), (x - mean) / np.sqrt(var + 1e-5), atol=1e-4)


def test_group_norm_shapes_and_stats(rng):
    x = rng.standard_normal((2, 4, 4, 4, 8)).astype(np.float32)
    y = np.asarray(N.group_norm(jnp.asarray(x), num_groups=4))
    assert y.shape == x.shape
    # each (sample, group) slab is standardized
    g = y.reshape(2, -1, 4, 2)
    np.testing.assert_allclose(g.mean(axis=(1, 3)), 0.0, atol=1e-3)


def test_norm_module_instance_cond_requires_modalities(rng):
    m = Norm(kind="instance_cond", features=3, num_styles=2)
    x = jnp.ones((2, 4, 4, 3))
    with pytest.raises(ValueError, match="modalities"):
        m.init(jax.random.key(0), x)


def test_norm_module_param_shapes():
    m = make_norm(("instance_cond", {"num_styles": 4}), features=6)
    x = jnp.ones((2, 4, 4, 4, 6))
    mods = jnp.array([0, 3], jnp.int32)
    params = m.init(jax.random.key(0), x, mods)
    assert params["params"]["scale"].shape == (4, 6)
    y = m.apply(params, x, mods)
    assert y.shape == x.shape


def test_parse_normalization_mapping():
    assert N.parse_normalization("instance_cond", num_styles=3) == (
        "instance_cond", {"num_styles": 3, "affine": True})
    assert N.parse_normalization("layer") == ("layer", {"elementwise_affine": True})
    assert N.parse_normalization("group", num_groups=4)[1]["num_groups"] == 4


def test_batch_norm_running_stats(rng):
    m = Norm(kind="batch", features=3)
    x = jnp.asarray(rng.standard_normal((8, 5, 3)).astype(np.float32) * 2 + 1)
    variables = m.init(jax.random.key(0), x)
    y, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    # running mean moved toward batch mean
    assert not np.allclose(np.asarray(mutated["batch_stats"]["mean"]), 0.0)


def test_packed_stats_matches_baseline(rng):
    """`_stats_packed` (128-lane relayout, round-4 layout experiment) must be
    numerically identical to the plain reduction for every packable shape."""
    for shape in [(2, 8, 4, 4, 48), (1, 16, 8, 8, 2), (2, 4, 8, 4, 13)]:
        c = shape[-1]
        pack = (128 * c) // np.gcd(c, 128)
        s = int(np.prod(shape[1:-1]))
        assert (s * c) % pack == 0, "test shape must be packable"
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3 + 1)
        mean_p, inv_p = N._stats_packed(x, eps=1e-5)
        axes = tuple(range(1, x.ndim - 1))
        mean_b, inv_b = N._stats(x, axes, eps=1e-5)
        np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_b),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(inv_p), np.asarray(inv_b),
                                   rtol=1e-4, atol=1e-5)


def test_packed_stats_gate_and_grad(rng, monkeypatch):
    """With MISEG_PACKED_STATS=1 the full instance norm (value AND gradient)
    must match the default path on a gate-eligible shape (spatial >= 2^15)."""
    monkeypatch.delenv("MISEG_PACKED_STATS", raising=False)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 4)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))

    def loss(xx, gg, bb):
        return jnp.sum(jnp.square(N.instance_norm(xx, gg, bb)))

    base_val, base_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, g, b)
    monkeypatch.setenv("MISEG_PACKED_STATS", "1")
    pack_val, pack_grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, g, b)
    np.testing.assert_allclose(float(pack_val), float(base_val), rtol=1e-5)
    for gp, gb in zip(pack_grads, base_grads):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_instance_norm_ill_conditioned_two_pass(rng):
    """Two-pass variance regression (round 5): channels with
    var << mean² — ubiquitous in real conv activations (post-bias) —
    must not lose digits to the one-pass E[x²]-mean² cancellation.
    Measured pre-fix: a swin patch-embed channel (mean -0.27, var 7e-4)
    came out 7.3e-3 wrong vs f64; torch's two-pass is ~1e-6."""
    from miseg_tpu.ops.norms import instance_norm

    # mean 10, std 1e-2: var/mean² = 1e-6 — brutal cancellation regime
    x = (10.0 + 0.01 * rng.standard_normal((2, 16, 16, 16, 4))).astype(
        np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    x64 = x.astype(np.float64)
    mean = x64.mean(axis=(1, 2, 3), keepdims=True)
    var = ((x64 - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    want = (x64 - mean) / np.sqrt(var + 1e-5)
    # one-pass f32 error here is O(1); two-pass lands ~1e-4
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_gelu_is_exact_erf_form(rng):
    """torch nn.GELU defaults to the exact erf form (reference
    factories.py:305); jax.nn.gelu defaults to the tanh approximation —
    a systematic ~3e-3 divergence at |x|≈2 the swin parity race
    surfaced (round 5).  The factory must resolve to the exact form."""
    import math as _math

    from miseg_tpu.nn.factories import get_act

    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(get_act("gelu")(jnp.asarray(x)))
    from scipy.special import erf
    want = x * 0.5 * (1.0 + erf(x.astype(np.float64) / _math.sqrt(2.0)))
    np.testing.assert_allclose(got, want, atol=1e-6)
