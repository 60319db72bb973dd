"""GOLDEN parity tests: run the reference's own torch modules and assert our
JAX ops reproduce them numerically.

The reference's scientific core is torch-only with no MONAI dependency
(networks/norms/conditional_instance_norm.py, networks/layers/
gradient_reversal/functional.py), so it is directly runnable in this
environment; swin_utils.py and window_attention.py additionally need einops
and two trivially-stubbable monai.utils symbols.  These tests certify the
re-implementation against the actual upstream code rather than a
re-derivation (all other parity tests in this suite compare to independent
numpy math).

Skipped gracefully when torch / einops / the reference tree are absent.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_path():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF)
    yield REF
    sys.path.remove(REF)


@pytest.fixture(scope="module")
def monai_stub():
    """Minimal stand-ins for the two monai.utils symbols swin_utils.py and
    window_attention.py import (optional_import / trunc_normal_); monai
    itself is not installed here."""
    if "monai" in sys.modules:
        yield
        return
    pytest.importorskip("einops")
    monai = types.ModuleType("monai")
    utils = types.ModuleType("monai.utils")

    def optional_import(module, name: str = "", **_):
        try:
            mod = __import__(module, fromlist=[name] if name else [])
            return (getattr(mod, name) if name else mod), True
        except ImportError:
            return None, False

    utils.optional_import = optional_import
    networks = types.ModuleType("monai.networks")
    layers = types.ModuleType("monai.networks.layers")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    layers.trunc_normal_ = trunc_normal_
    networks.layers = layers
    monai.utils = utils
    monai.networks = networks
    mods = {"monai": monai, "monai.utils": utils,
            "monai.networks": networks, "monai.networks.layers": layers}
    sys.modules.update(mods)
    yield
    for k in mods:
        sys.modules.pop(k, None)


# ---------------------------------------------------------- cond-norm


@pytest.mark.parametrize("nd", [1, 2, 3])
def test_conditional_instance_norm_matches_reference(ref_path, nd):
    """Our vectorized gather+norm == the reference's per-sample module-bank
    loop (conditional_instance_norm.py:27-60), same (gamma, beta) banks."""
    from networks.norms import conditional_instance_norm as ref_mod
    from miseg_tpu.ops.norms import conditional_instance_norm

    rng = np.random.default_rng(0)
    num_styles, C, B = 3, 5, 4
    spatial = {1: (11,), 2: (7, 9), 3: (5, 6, 7)}[nd]
    cls = getattr(ref_mod, f"ConditionalInstanceNorm{nd}d")
    m = cls(num_styles, C)
    gamma = rng.normal(1.0, 0.3, (num_styles, C)).astype(np.float32)
    beta = rng.normal(0.0, 0.3, (num_styles, C)).astype(np.float32)
    with torch.no_grad():
        for s in range(num_styles):
            m.norms[s].weight.copy_(torch.from_numpy(gamma[s]))
            m.norms[s].bias.copy_(torch.from_numpy(beta[s]))

    x = rng.normal(0, 2, (B, C, *spatial)).astype(np.float32)
    styles = rng.integers(0, num_styles, B)
    ref_out = m(torch.from_numpy(x), torch.from_numpy(styles)).detach().numpy()

    # ours is channel-last: [B, *spatial, C]
    x_cl = np.moveaxis(x, 1, -1)
    ours = conditional_instance_norm(jnp.asarray(x_cl), jnp.asarray(styles),
                                     jnp.asarray(gamma), jnp.asarray(beta))
    ours_cf = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours_cf, ref_out, atol=2e-5, rtol=1e-5)


def test_parameter_free_instance_norm_matches_torch_functional(ref_path):
    """Swin proj_out uses parameter-free F.instance_norm
    (swin_transformer.py:135-136); certify our instance_norm against it."""
    from miseg_tpu.ops.norms import instance_norm
    rng = np.random.default_rng(1)
    x = rng.normal(0, 3, (2, 4, 6, 7, 8)).astype(np.float32)  # [B,C,D,H,W]
    ref = torch.nn.functional.instance_norm(torch.from_numpy(x)).numpy()
    ours = instance_norm(jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               atol=2e-5, rtol=1e-5)


# ------------------------------------------------------ gradient reversal


def test_gradient_reversal_matches_reference(ref_path):
    """Our custom_vjp == the reference autograd.Function
    (gradient_reversal/functional.py:3-16): identity forward, -alpha·g back."""
    from networks.layers.gradient_reversal.functional import revgrad
    from miseg_tpu.nn.layers import gradient_reversal

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (3, 7)).astype(np.float32)
    w = rng.normal(0, 1, (3, 7)).astype(np.float32)
    alpha = 0.73

    xt = torch.from_numpy(x).requires_grad_(True)
    y = revgrad(xt, torch.tensor(alpha))
    (y * torch.from_numpy(w)).sum().backward()
    ref_fwd = y.detach().numpy()
    ref_grad = xt.grad.numpy()

    fwd = np.asarray(gradient_reversal(jnp.asarray(x), alpha))
    grad = np.asarray(jax.grad(
        lambda a: (gradient_reversal(a, alpha) * jnp.asarray(w)).sum())(
            jnp.asarray(x)))
    np.testing.assert_allclose(fwd, ref_fwd, atol=0)
    np.testing.assert_allclose(grad, ref_grad, atol=1e-6)
    np.testing.assert_allclose(grad, -alpha * w, atol=1e-6)


# ------------------------------------------------------------ swin utils


def test_window_partition_reverse_match_reference(ref_path, monai_stub):
    from networks.utils import swin_utils as ref
    from miseg_tpu.ops import window as ours

    rng = np.random.default_rng(3)
    # 3D
    x = rng.normal(0, 1, (2, 4, 6, 8, 5)).astype(np.float32)
    ws = (2, 3, 4)
    ref_w = ref.window_partition(torch.from_numpy(x), ws).numpy()
    our_w = np.asarray(ours.window_partition(jnp.asarray(x), ws))
    np.testing.assert_array_equal(our_w, ref_w)
    ref_back = ref.window_reverse(torch.from_numpy(ref_w), ws, (2, 4, 6, 8)).numpy()
    our_back = np.asarray(ours.window_reverse(jnp.asarray(our_w), ws, (2, 4, 6, 8)))
    np.testing.assert_array_equal(our_back, ref_back)
    np.testing.assert_array_equal(our_back, x)
    # 2D
    x2 = rng.normal(0, 1, (3, 6, 8, 4)).astype(np.float32)
    ws2 = (3, 2)
    ref_w2 = ref.window_partition(torch.from_numpy(x2), ws2).numpy()
    our_w2 = np.asarray(ours.window_partition(jnp.asarray(x2), ws2))
    np.testing.assert_array_equal(our_w2, ref_w2)


def test_get_window_size_matches_reference(ref_path, monai_stub):
    from networks.utils import swin_utils as ref
    from miseg_tpu.ops.window import get_window_size
    cases = [((96, 96, 96), (7, 7, 7), (3, 3, 3)),
             ((4, 96, 5), (7, 7, 7), (3, 3, 3)),
             ((7, 7), (7, 7), (3, 3)),
             ((8, 6), (7, 7), (3, 3))]
    for x_size, ws, ss in cases:
        assert get_window_size(x_size, ws, ss) == ref.get_window_size(x_size, ws, ss)
        assert get_window_size(x_size, ws) == ref.get_window_size(x_size, ws)


@pytest.mark.parametrize("dims,ws,ss", [
    ((8, 8, 8), (4, 4, 4), (2, 2, 2)),
    ((12, 8, 4), (4, 4, 4), (2, 2, 1)),
    ((10, 10), (5, 5), (2, 2)),
])
def test_compute_mask_matches_reference(ref_path, monai_stub, dims, ws, ss):
    from networks.utils import swin_utils as ref
    from miseg_tpu.ops.window import compute_mask, compute_mask_jnp
    ref_mask = ref.compute_mask(list(dims), ws, ss, device="cpu").numpy()
    ours = compute_mask(tuple(dims), tuple(ws), tuple(ss))
    np.testing.assert_array_equal(ours, ref_mask)
    ours_dev = np.asarray(compute_mask_jnp(tuple(dims), tuple(ws), tuple(ss)))
    np.testing.assert_array_equal(ours_dev, ref_mask)


# ------------------------------------------------------ window attention


@pytest.mark.parametrize("nd", [2, 3])
def test_window_attention_matches_reference(ref_path, monai_stub, nd):
    """Full WindowAttention forward parity, weights copied from the torch
    module (window_attention.py:16-121): qkv/proj linears, relative-position
    bias table + index, shifted-window mask add."""
    from networks.blocks.window_attention import WindowAttention as RefAttn
    from miseg_tpu.nn.swin import WindowAttention
    from miseg_tpu.ops.window import compute_mask

    rng = np.random.default_rng(4)
    dim, heads = 12, 3
    ws = (3, 4, 2)[:nd]
    n = int(np.prod(ws))
    ref = RefAttn(dim=dim, num_heads=heads, window_size=ws, qkv_bias=True)
    ref.eval()

    dims = tuple(2 * w for w in ws)
    ss = tuple(max(1, w // 2) for w in ws)
    mask = compute_mask(dims, ws, ss)
    nw = mask.shape[0]
    b = 2 * nw  # batch of 2 volumes worth of windows
    x = rng.normal(0, 1, (b, n, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    model = WindowAttention(num_heads=heads, window_size=ws, qkv_bias=True)
    params = {
        "relative_position_bias_table":
            jnp.asarray(ref.relative_position_bias_table.detach().numpy()),
        "qkv": {"kernel": jnp.asarray(ref.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.qkv.bias.detach().numpy())},
        "proj": {"kernel": jnp.asarray(ref.proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(ref.proj.bias.detach().numpy())},
    }
    ours = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=3e-5, rtol=1e-4)
    # our static rel-pos index must equal the reference's registered buffer
    from miseg_tpu.nn.swin import _rel_pos_index
    np.testing.assert_array_equal(_rel_pos_index(ws),
                                  ref.relative_position_index.numpy())


# ------------------------------------------------------ parse_normalization


def test_parse_normalization_matches_reference(ref_path):
    from networks.norms.utils import parse_normalization as ref_parse
    from miseg_tpu.ops.norms import parse_normalization
    assert parse_normalization("instance_cond", num_styles=4, affine=True) == \
        ref_parse("instance_cond", affine=True, num_styles=4)
    assert parse_normalization("instance", affine=True) == \
        ref_parse("instance", affine=True)
    assert parse_normalization("batch", affine=False) == \
        ref_parse("batch", affine=False)
    assert parse_normalization("layer", affine=True) == \
        ref_parse("layer", affine=True)
    assert parse_normalization("group", affine=True, num_groups=8) == \
        ref_parse("group", affine=True, num_groups=8)
