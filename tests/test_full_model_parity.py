"""GOLDEN full-model parity: the reference's own torch nets (run via the
monai stub, `miseg_tpu/compat/monai_stub.py`) vs our flax models with
weights translated by `miseg_tpu.train.ref_import`.

Round-2 certified the atoms (cond-norm, grad-reversal, swin utils,
WindowAttention); these tests certify the COMPOSITION: full C-UNet,
C-UNETR and C-Swin-UNETR forwards with copied weights on ≥64³ inputs and
mixed CT/MR modalities (VERDICT round-2, Missing #1).

Reference surfaces: networks/nets/swin_unetr.py:353-366 (from_argparse_args
wiring), networks/nets/unetr.py, networks/nets/unet.py:116-205.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_models():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    pytest.importorskip("einops")
    from miseg_tpu.compat import install_monai_stub
    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_monai_stub(REF)
    import networks.nets.swin_unetr as swin_mod
    import networks.nets.unet as unet_mod
    import networks.nets.unetr as unetr_mod
    from networks.norms.utils import parse_normalization
    return swin_mod, unetr_mod, unet_mod, parse_normalization


def _fill_params(template, src):
    """Place translated weights into the eval_shape template, asserting
    full coverage and exact shape agreement (no silent partial load)."""
    from miseg_tpu.train.pretrained import _flatten, _unflatten
    tflat = _flatten(template)
    sflat = _flatten(src)
    missing = sorted(set(tflat) - set(sflat))
    unexpected = sorted(set(sflat) - set(tflat))
    assert not missing, f"untranslated params: {missing[:8]}"
    assert not unexpected, f"extra translated params: {unexpected[:8]}"
    out = {}
    for path, leaf in tflat.items():
        v = np.asarray(sflat[path], np.float32)
        assert v.shape == tuple(leaf.shape), \
            f"{'/'.join(path)}: {v.shape} != {tuple(leaf.shape)}"
        out[path] = jnp.asarray(v)
    return _unflatten(out)


def _compare(cfg, ref_model, model_name, x_cf, modalities, atol):
    from miseg_tpu.models import model_from_config
    from miseg_tpu.train.ref_import import reference_to_flax

    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x_cf),
                            torch.from_numpy(modalities)).numpy()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    model = model_from_config(cfg)
    x_cl = jnp.asarray(np.moveaxis(x_cf, 1, -1))
    mods = jnp.asarray(modalities)
    template = jax.eval_shape(
        model.init, {"params": jax.random.key(0)}, x_cl, mods)["params"]
    params = _fill_params(template, reference_to_flax(model_name, sd))
    ours = model.apply({"params": params}, x_cl, mods)
    ours_cf = np.moveaxis(np.asarray(ours), -1, 1)
    assert ours_cf.shape == ref_out.shape
    np.testing.assert_allclose(ours_cf, ref_out, atol=atol, rtol=1e-4)


def test_c_swin_unetr_full_forward_parity(ref_models):
    """C-Swin-UNETR (cond encoder+vit norms) — includes the bottleneck
    window-clip bias-subset quirk at 64³ (4³ windows at stage 4)."""
    swin_mod, _, _, parse_normalization = ref_models
    from miseg_tpu.config import Config
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    ref = swin_mod.SwinUNETR(
        img_size=(64, 64, 64), in_channels=1, out_channels=6,
        feature_size=12, num_heads=(2, 4, 8, 16), depths=(2, 2, 2, 2),
        encoder_norm_name=cond, vit_norm_name=cond, decoder_norm_name=inst)
    cfg = Config(model_name="swin_unetr", out_channels=6, feature_size=[12],
                 num_heads=2, roi_x=64, roi_y=64, roi_z=64,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 1, 64, 64, 64)).astype(np.float32)
    mods = np.array([0, 1], np.int64)
    _compare(cfg, ref, "swin_unetr", x, mods, atol=2e-4)


def test_c_unetr_full_forward_parity(ref_models):
    """C-UNETR: conditional ViT + encoders, perceptron patch embedding."""
    _, unetr_mod, _, parse_normalization = ref_models
    from miseg_tpu.config import Config
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    ref = unetr_mod.UNETR(
        in_channels=1, out_channels=6, img_size=(64, 64, 64), feature_size=8,
        hidden_size=96, mlp_dim=192, num_heads=4, pos_embed="perceptron",
        vit_norm_name=cond, encoder_norm_name=cond, decoder_norm_name=inst)
    cfg = Config(model_name="unetr", out_channels=6, feature_size=[8],
                 hidden_size=96, mlp_dim=192, num_heads=4,
                 pos_embed="perceptron", roi_x=64, roi_y=64, roi_z=64,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 1, 64, 64, 64)).astype(np.float32)
    mods = np.array([1, 0], np.int64)
    # 12 sequential transformer blocks: f32 reduction-order noise puts a
    # handful of 3.1M outputs at ~2.5e-4 (99.9999% are within 2e-4)
    _compare(cfg, ref, "unetr", x, mods, atol=5e-4)


def test_c_unet_full_forward_parity(ref_models):
    """C-UNet: recursive residual UNet with conditional down-path norms."""
    _, _, unet_mod, parse_normalization = ref_models
    from miseg_tpu.config import Config
    cond = parse_normalization("instance_cond", True, None, 2)
    inst = parse_normalization("instance", True, None, 2)
    ref = unet_mod.UNet(
        spatial_dims=3, in_channels=1, out_channels=6,
        channels=[16, 32, 64], strides=[2, 2], num_res_units=2,
        norm_down=cond, norm_up=inst)
    # our factory derives channels = fs·2^i for i in 1..num_layers (the
    # reference's 2·fs quirk, unet.py:219) → feature_size 8 ⇒ [16, 32, 64]
    cfg = Config(model_name="unet", out_channels=6, feature_size=[8],
                 num_layers=3, strides=[2, 2], num_res_units=2,
                 roi_x=64, roi_y=64, roi_z=64,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond", decoder_norm_name="instance")
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 1, 64, 64, 64)).astype(np.float32)
    mods = np.array([0, 1], np.int64)
    _compare(cfg, ref, "unet", x, mods, atol=2e-4)
