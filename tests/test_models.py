"""Model-level tests: shapes, modality sensitivity, config factory, and a
multi-device sharded step (slow swin/unetr variants are in test_models_slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.models import UNet, UNetVanilla, model_from_config


@pytest.fixture(scope="module")
def unet_small():
    model = UNet(in_channels=1, out_channels=3, channels=(4, 8), strides=(2,),
                 num_res_units=1, norm_down=("instance_cond", {"num_styles": 2}),
                 norm_up=("instance", {}))
    x = jnp.ones((2, 16, 16, 16, 1))
    mods = jnp.array([0, 1], jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x, mods)
    return model, variables


def test_unet_shape(unet_small):
    model, variables = unet_small
    x = jnp.ones((2, 16, 16, 16, 1))
    y = model.apply(variables, x, jnp.array([0, 1], jnp.int32))
    assert y.shape == (2, 16, 16, 16, 3)


def test_unet_modality_sensitivity(unet_small, rng):
    """Different style ids must produce different outputs after the norm
    banks diverge — here we perturb one bank directly."""
    model, variables = unet_small
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    # find a cond-norm scale leaf ([num_styles, C]) and perturb style 1
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    target = None
    for path, leaf in flat:
        if leaf.ndim == 2 and leaf.shape[0] == 2 and "scale" in str(path[-1]):
            target = path
            break
    assert target is not None
    def bump(p, leaf):
        if p == target:
            return leaf.at[1].mul(3.0)
        return leaf
    params = jax.tree_util.tree_map_with_path(bump, params)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1)), jnp.float32)
    y0 = model.apply({"params": params}, x, jnp.array([0], jnp.int32))
    y1 = model.apply({"params": params}, x, jnp.array([1], jnp.int32))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_unet_vanilla_shape():
    model = UNetVanilla(in_channels=1, out_channels=2, channels=(4, 8, 16),
                        strides=(1, 2, 2), num_res_units=2,
                        norm_down=("instance_cond", {}), norm_up=("instance", {}))
    x = jnp.ones((1, 16, 16, 16, 1))
    v = model.init({"params": jax.random.key(0)}, x, jnp.array([0], jnp.int32))
    y = model.apply(v, x, jnp.array([0], jnp.int32))
    assert y.shape == (1, 16, 16, 16, 2)


def test_factory_dispatch_and_validation():
    cfg = Config(model_name="unet", feature_size=[8], num_layers=3,
                 strides=[2, 2])
    m = model_from_config(cfg)
    # reference quirk: channels start at 2*feature_size (unet.py:218-219)
    assert list(m.channels) == [16, 32, 64]
    with pytest.raises(ValueError):
        model_from_config(Config(model_name="bogus"))
    with pytest.raises(ValueError):
        model_from_config(Config(model_name="swin_unetr",
                                 depth_swin_block=[2, 2]))


def test_swin_unetr_feature_size_validation():
    from miseg_tpu.models import SwinUNETR
    m = SwinUNETR(img_size=(32, 32, 32), in_channels=1, out_channels=2,
                  feature_size=10)
    with pytest.raises(ValueError, match="divisible by 12"):
        m.init({"params": jax.random.key(0)}, jnp.ones((1, 32, 32, 32, 1)),
               jnp.array([0], jnp.int32))


def test_unetr_rejects_layer_decoder_norm():
    from miseg_tpu.models import UNETR
    m = UNETR(in_channels=1, out_channels=2, img_size=(32, 32, 32),
              decoder_norm=("layer", {}))
    with pytest.raises(ValueError, match="Layer normalization"):
        m.init({"params": jax.random.key(0)}, jnp.ones((1, 32, 32, 32, 1)),
               jnp.array([0], jnp.int32))


def test_sharded_forward_8_devices(unet_small):
    """Forward over a 8-device data-parallel mesh (DDP analog)."""
    from miseg_tpu.parallel import make_mesh, shard_batch
    model, variables = unet_small
    mesh = make_mesh((8,), ("data",))
    batch = {"image": jnp.ones((8, 16, 16, 16, 1)),
             "modality": jnp.arange(8, dtype=jnp.int32) % 2}
    b = shard_batch(batch, mesh)
    y = jax.jit(lambda v, x, m: model.apply(v, x, m))(variables, b["image"],
                                                      b["modality"])
    assert y.shape == (8, 16, 16, 16, 3)
    assert len(y.sharding.device_set) == 8


def test_unet_2d_forward():
    """Blocks are rank-agnostic; spatial_dims=2 works end to end."""
    model = UNet(in_channels=1, out_channels=2, channels=(4, 8), strides=(2,),
                 num_res_units=1, norm_down=("instance_cond", {}),
                 norm_up=("instance", {}))
    x = jnp.ones((2, 16, 16, 1))
    v = model.init({"params": jax.random.key(0)}, x, jnp.array([0, 1], jnp.int32))
    y = model.apply(v, x, jnp.array([0, 1], jnp.int32))
    assert y.shape == (2, 16, 16, 2)


def test_vit_classification_head():
    from miseg_tpu.models import ViT
    m = ViT(in_channels=1, img_size=(32, 32, 32), patch_size=(16, 16, 16),
            hidden_size=48, mlp_dim=96, num_layers=1, num_heads=3,
            classification=True, num_classes=5,
            classification_reverse_gradient=True, post_activation="Tanh")
    x = jnp.ones((2, 32, 32, 32, 1))
    v = m.init({"params": jax.random.key(0)}, x)
    logits, hidden = m.apply(v, x)
    assert logits.shape == (2, 5)
    assert len(hidden) == 1
    assert np.abs(np.asarray(logits)).max() <= 1.0  # tanh head
