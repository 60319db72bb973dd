"""Spatial partitioning (SP) on the 8-device CPU mesh.

The reference has no analog (DDP only scales batch, train.py:47); SP is
the TPU-native extension that shards the training PATCH's D dim across a
mesh axis (parallel/spatial.py) so batch=1 patches larger than one chip's
HBM become trainable.  Certified here: (a) placement rules, (b) the
forward actually runs spatially sharded (output placement is split, not
replicated), (c) train-step numerics match plain DP exactly, (d) hybrid
DP x SP on a 2-D mesh, (e) the engine flag wires through.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miseg_tpu.config import Config
from miseg_tpu.parallel import make_mesh, shard_spatial_batch, spatial_spec
from jax.sharding import NamedSharding, PartitionSpec as P


def test_spatial_spec_rules():
    assert spatial_spec(5, "data", "sp") == P("data", "sp")
    assert spatial_spec(4, None, "sp") == P(None, "sp")
    assert spatial_spec(1, "data", "sp") == P("data")
    assert spatial_spec(1, None, "sp") == P()


def test_shard_spatial_batch_placement():
    mesh = make_mesh((2, 4), ("data", "sp"))
    batch = {"image": np.zeros((2, 16, 8, 8, 1), np.float32),
             "label": np.zeros((2, 16, 8, 8), np.int32),
             "modality": np.zeros((2,), np.int32),
             "name": "vol1"}
    b = shard_spatial_batch(batch, mesh)
    assert b["image"].sharding.spec == P("data", "sp")
    assert b["label"].sharding.spec == P("data", "sp")
    assert b["modality"].sharding.spec == P("data")
    assert b["name"] == "vol1"
    # indivisible dims degrade to replication per-dim, never error
    odd = shard_spatial_batch({"image": np.zeros((3, 15, 8, 8, 1))}, mesh)
    assert odd["image"].sharding.spec == P()


def _tiny_cfg(tmp_path, **kw):
    return Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                  out_channels=2, feature_size=[8], num_layers=2, strides=[2],
                  num_res_units=1, encoder_norm_name="instance_cond",
                  decoder_norm_name="instance", criterion="dice_ce",
                  batch_size=8, scheduler="none", no_amp=True, precision="fp32",
                  default_root_dir=str(tmp_path), **kw)


def test_forward_runs_spatially_sharded(tmp_path):
    """SP-only 1-D mesh: jit the forward with the image sharded on dim D
    and check (a) numerics match the replicated forward, (b) the OUTPUT
    placement is still split — i.e. GSPMD propagated the spatial sharding
    through convs/norms end-to-end instead of all-gathering at the top."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(0)
    image = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    modality = np.zeros((1,), np.int32)

    mesh = make_mesh((8,), ("sp",))
    cfg = _tiny_cfg(tmp_path, spatial_shard=True,
                    mesh_shape=[8], mesh_axes=["sp"])
    t = Trainer(cfg, mesh=mesh, workdir=str(tmp_path))
    s = t.init_state(image, modality)

    x_sp = jax.device_put(image, NamedSharding(mesh, P(None, "sp")))
    fwd = jax.jit(lambda p, x, m: t.apply_fn(p, x, m, train=False))
    out_sp = fwd(s.params, x_sp, modality)
    assert not out_sp.sharding.is_fully_replicated, \
        "logits came back replicated — SP did not propagate"
    out_rep = fwd(s.params, jnp.asarray(image), jnp.asarray(modality))
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_rep),
                               rtol=2e-5, atol=1e-5)


def test_sp_train_step_matches_dp(tmp_path):
    """One train step, same seed/init: 8-way SP over the patch's D dim
    equals the plain DP step up to f32 reduction order.  SGD, not Adam:
    at step 1 Adam's update is ~sign(g), so reduction-order noise on a
    near-zero grad leaf flips a whole lr quantum — SGD keeps the
    comparison proportional to the actual grad difference."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(1)
    image = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(2, 16, 16, 16)) > 0.7).astype(np.int32)
    modality = np.array([0, 1], np.int32)
    batch = {"image": image, "label": label, "modality": modality}

    mesh_sp = make_mesh((8,), ("sp",))
    t_sp = Trainer(_tiny_cfg(tmp_path / "sp", spatial_shard=True,
                             optim_name="sgd",
                             mesh_shape=[8], mesh_axes=["sp"]),
                   mesh=mesh_sp, workdir=str(tmp_path / "sp"))
    s_sp = t_sp.init_state(image[:1], modality[:1])

    mesh_dp = make_mesh((8,), ("data",))
    t_dp = Trainer(_tiny_cfg(tmp_path / "dp", optim_name="sgd"),
                   mesh=mesh_dp, workdir=str(tmp_path / "dp"))
    s_dp = t_dp.init_state(image[:1], modality[:1])

    s_sp2, loss_sp = t_sp.train_step(s_sp, batch)
    s_dp2, loss_dp = t_dp.train_step(s_dp, batch)
    np.testing.assert_allclose(float(loss_sp), float(loss_dp), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s_sp2.params, s_dp2.params)


def test_hybrid_dp_sp_2d_mesh(tmp_path):
    """2-D mesh ("data", "sp"): batch 2-way DP x patch 4-way SP, one jit;
    numerics match the 1-D DP step."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(2)
    image = rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(2, 16, 16, 16)) > 0.7).astype(np.int32)
    modality = np.array([0, 1], np.int32)
    batch = {"image": image, "label": label, "modality": modality}

    mesh2d = make_mesh((2, 4), ("data", "sp"))
    t_hy = Trainer(_tiny_cfg(tmp_path / "hy", spatial_shard=True,
                             optim_name="sgd",
                             mesh_shape=[2, 4], mesh_axes=["data", "sp"]),
                   mesh=mesh2d, workdir=str(tmp_path / "hy"))
    s_hy = t_hy.init_state(image[:1], modality[:1])
    b = shard_spatial_batch(batch, mesh2d)
    assert b["image"].sharding.spec == P("data", "sp")

    mesh_dp = make_mesh((8,), ("data",))
    t_dp = Trainer(_tiny_cfg(tmp_path / "dp", optim_name="sgd"),
                   mesh=mesh_dp, workdir=str(tmp_path / "dp"))
    s_dp = t_dp.init_state(image[:1], modality[:1])

    s_hy2, loss_hy = t_hy.train_step(s_hy, batch)
    s_dp2, loss_dp = t_dp.train_step(s_dp, batch)
    np.testing.assert_allclose(float(loss_hy), float(loss_dp), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        s_hy2.params, s_dp2.params)


@pytest.mark.slow
def test_sp_swin_forward(tmp_path):
    """SP through the swin path: shifted-window rolls become collective
    permutes, window-partition reshapes reshard, patch merging halves the
    sharded dim — all inserted by GSPMD.  Parity vs the replicated
    forward on the flagship architecture (tiny config)."""
    from miseg_tpu.models import model_from_config

    cfg = Config(model_name="swin_unetr", roi_x=32, roi_y=32, roi_z=32,
                 out_channels=4, feature_size=[12], num_heads=2,
                 depth_swin_block=[1], vit_norm_name="instance_cond",
                 encoder_norm_name="instance_cond",
                 decoder_norm_name="instance")
    m = model_from_config(cfg)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 32, 32, 32, 1)).astype(np.float32)
    mods = np.array([1], np.int32)
    v = m.init({"params": jax.random.key(0)}, jnp.asarray(x),
               jnp.asarray(mods))

    mesh = make_mesh((8,), ("sp",))
    x_sp = jax.device_put(x, NamedSharding(mesh, P(None, "sp")))
    fwd = jax.jit(lambda v, x, mo: m.apply(v, x, mo))
    y_sp = fwd(v, x_sp, jnp.asarray(mods))
    y_rep = fwd(v, jnp.asarray(x), jnp.asarray(mods))
    # 19 instance-norms' spatial stats + softmaxes re-reduced in sharded
    # order: f32 wobble accumulates to ~1e-4 absolute on O(1) logits
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_rep),
                               rtol=1e-3, atol=5e-4)
