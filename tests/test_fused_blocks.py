"""Fused Pallas conv-block path vs the plain path: identical parameter
trees and matching outputs/gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.nn.dynunet import UnetBasicBlock, UnetResBlock
from miseg_tpu.ops import dispatch


@pytest.fixture
def flag_conv(monkeypatch):
    def set_flag(on: bool):
        monkeypatch.setenv("MISEG_PALLAS_CONV", "1" if on else "0")
        monkeypatch.setenv("MISEG_PALLAS_NORM", "0")
        monkeypatch.setenv("MISEG_PALLAS_ATTN", "0")
        dispatch.clear_cache()
    yield set_flag
    dispatch.clear_cache()


CASES = [
    (UnetResBlock, dict(out_channels=8, norm=("instance_cond", {"num_styles": 2})), 4),
    (UnetResBlock, dict(out_channels=8, norm=("instance", {})), 8),  # identity res
    (UnetBasicBlock, dict(out_channels=8, norm=("instance_cond", {"num_styles": 2})), 4),
]


@pytest.mark.parametrize("cls,kw,cin", CASES)
def test_fused_block_matches_plain(flag_conv, cls, kw, cin, rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, cin)), jnp.float32)
    mods = jnp.asarray([0, 1], jnp.int32)
    block = cls(kernel_size=3, stride=1, **kw)

    flag_conv(False)
    variables = block.init({"params": jax.random.key(0)}, x, mods)
    want = block.apply(variables, x, mods)

    flag_conv(True)
    variables_fused = block.init({"params": jax.random.key(0)}, x, mods)
    # identical parameter trees (paths AND values) regardless of dispatch
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables_fused))
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(variables_fused)):
        assert a.shape == b.shape
        assert np.allclose(np.asarray(a), np.asarray(b))

    got = block.apply(variables, x, mods)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=5e-5), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_fused_block_gradients(flag_conv, rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 6, 4)), jnp.float32)
    mods = jnp.asarray([1], jnp.int32)
    block = UnetResBlock(out_channels=8, kernel_size=3, stride=1,
                         norm=("instance_cond", {"num_styles": 2}))
    flag_conv(False)
    variables = block.init({"params": jax.random.key(0)}, x, mods)

    def loss(params, on):
        flag_conv(on)
        y = block.apply({"params": params}, x, mods)
        return jnp.sum(jnp.sin(y))

    from jax.flatten_util import ravel_pytree
    g_plain = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_fused = jax.grad(lambda p: loss(p, True))(variables["params"])
    flat_p, _ = ravel_pytree(g_plain)
    flat_f, _ = ravel_pytree(g_fused)
    assert np.allclose(np.asarray(flat_p), np.asarray(flat_f),
                       atol=1e-3, rtol=1e-3), \
        np.abs(np.asarray(flat_p) - np.asarray(flat_f)).max()


def test_fused_plan_rejects_unsupported(flag_conv, rng):
    """Strided / 2D / non-leaky / missing-modalities cases fall back."""
    flag_conv(True)
    x2d = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    blk = UnetResBlock(out_channels=8, kernel_size=3, stride=1,
                       norm=("instance", {}))
    v = blk.init({"params": jax.random.key(0)}, x2d, None)
    assert np.isfinite(np.asarray(blk.apply(v, x2d, None))).all()

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 4)), jnp.float32)
    blk = UnetResBlock(out_channels=8, kernel_size=3, stride=2,
                       norm=("instance", {}))
    v = blk.init({"params": jax.random.key(0)}, x, None)
    assert blk.apply(v, x, None).shape == (1, 4, 4, 4, 8)


def test_fused_block_under_remat(flag_conv, rng):
    """custom_vjp fused kernels compose with nn.remat (use_checkpoint) —
    gradient checkpointing re-runs the Pallas forward in the backward."""
    import flax.linen as nn

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 4)), jnp.float32)
    mods = jnp.asarray([0], jnp.int32)

    def make_loss(use_remat, on):
        cls = (nn.remat(UnetResBlock, static_argnums=())
               if use_remat else UnetResBlock)
        block = cls(out_channels=8, kernel_size=3, stride=1,
                    norm=("instance_cond", {"num_styles": 2}))

        def loss(params):
            flag_conv(on)
            y = block.apply({"params": params}, x, mods)
            return jnp.sum(jnp.sin(y))
        return block, loss

    flag_conv(False)
    plain_block, _ = make_loss(False, False)
    variables = plain_block.init({"params": jax.random.key(0)}, x, mods)

    grads = {}
    for use_remat in (False, True):
        for on in (False, True):
            _, loss = make_loss(use_remat, on)
            grads[(use_remat, on)] = jax.grad(loss)(variables["params"])
    from jax.flatten_util import ravel_pytree
    base, _ = ravel_pytree(grads[(False, False)])
    for key, g in grads.items():
        flat, _ = ravel_pytree(g)
        assert np.allclose(np.asarray(flat), np.asarray(base),
                           atol=2e-3, rtol=2e-3), key
