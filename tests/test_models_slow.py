"""Slow model tests (full UNETR / Swin-UNETR forward) — minutes of XLA
compile on CPU; excluded from the quick suite via -m "not slow"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.models import model_from_config

pytestmark = pytest.mark.slow


def _run(name, **kw):
    cfg = Config(model_name=name, roi_x=32, roi_y=32, roi_z=32, out_channels=6,
                 vit_norm_name="instance_cond",
                 encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", **kw)
    m = model_from_config(cfg)
    x = jnp.ones((2, 32, 32, 32, 1))
    mods = jnp.array([0, 1], jnp.int32)
    v = m.init({"params": jax.random.key(0)}, x, mods)
    y = m.apply(v, x, mods)
    assert y.shape == (2, 32, 32, 32, 6)
    return v


def test_unetr_forward():
    _run("unetr", feature_size=[16], hidden_size=96, mlp_dim=384, num_heads=3)


def test_swin_unetr_forward():
    _run("swin_unetr", feature_size=[12], num_heads=3)


def test_swin_unetr_remat_matches():
    cfg = dict(feature_size=[12], num_heads=2, depth_swin_block=[1])
    v = _run("swin_unetr", **cfg)
    cfg2 = Config(model_name="swin_unetr", roi_x=32, roi_y=32, roi_z=32,
                  out_channels=6, vit_norm_name="instance_cond",
                  encoder_norm_name="instance_cond",
                  decoder_norm_name="instance", use_checkpoint=True, **cfg)
    m2 = model_from_config(cfg2)
    x = jnp.ones((2, 32, 32, 32, 1))
    mods = jnp.array([0, 1], jnp.int32)
    v2 = m2.init({"params": jax.random.key(0)}, x, mods)
    # same param structure under remat
    s1 = jax.tree_util.tree_structure(v)
    s2 = jax.tree_util.tree_structure(v2)
    assert s1 == s2


def test_swin_unetr_2d_forward():
    """2D spatial_dims path: window ops, masks, and merging all rank-agnostic."""
    from miseg_tpu.models import SwinUNETR
    m = SwinUNETR(img_size=(64, 64), in_channels=1, out_channels=3,
                  feature_size=12, num_heads=(2, 2, 2, 2),
                  depths=(1, 1, 1, 1),
                  vit_norm=("instance_cond", {"num_styles": 2}),
                  encoder_norm=("instance", {}), decoder_norm=("instance", {}))
    x = jnp.ones((2, 64, 64, 1))
    mods = jnp.array([0, 1], jnp.int32)
    v = m.init({"params": jax.random.key(0)}, x, mods)
    y = m.apply(v, x, mods)
    assert y.shape == (2, 64, 64, 3)
