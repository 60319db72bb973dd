"""FSDP (ZeRO-3) parameter/optimizer sharding on the 8-device CPU mesh.

The reference has no analog (DDP replicates everything, train.py:47);
this is the TPU-native scaling extension: `parallel/fsdp.py` computes
leaf-wise NamedShardings, the unchanged jitted train step runs under
GSPMD.  Certified here: (a) placements actually shard, (b) the numerics
match the replicated DP step exactly, (c) the engine flag wires through.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miseg_tpu.config import Config
from miseg_tpu.parallel import (leaf_spec, make_mesh, shard_state,
                                sharded_fraction, tree_shardings)
from jax.sharding import PartitionSpec as P


def test_leaf_spec_rules():
    # largest divisible dim wins; ties prefer the last qualifying dim
    assert leaf_spec((3, 3, 3, 16, 48), 8, "data") == P(None, None, None, None, "data")
    assert leaf_spec((16, 16), 8, "data", min_size=1) == P(None, "data")
    # no divisible dim -> replicated
    assert leaf_spec((7, 9, 11, 13), 8, "data", min_size=1) == P()
    # small leaves replicate
    assert leaf_spec((2, 48), 8, "data") == P()
    # scalar / empty
    assert leaf_spec((), 8, "data") == P()
    # single device -> replicated
    assert leaf_spec((64, 64), 1, "data") == P()


def test_tree_shardings_mixed_tree():
    mesh = make_mesh((8,), ("data",))
    tree = {"big": jnp.zeros((128, 128)), "small": jnp.zeros((4, 4)),
            "scalar": jnp.zeros(())}
    sh = tree_shardings(tree, mesh)
    assert sh["big"].spec == P(None, "data")  # tie prefers the last dim
    assert sh["small"].spec == P()
    assert sh["scalar"].spec == P()


def _tiny_cfg(tmp_path, **kw):
    return Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                  out_channels=2, feature_size=[8], num_layers=2, strides=[2],
                  num_res_units=1, encoder_norm_name="instance_cond",
                  decoder_norm_name="instance", criterion="dice_ce",
                  batch_size=8, scheduler="none", no_amp=True, precision="fp32",
                  default_root_dir=str(tmp_path), **kw)


def test_fsdp_state_is_sharded_and_step_matches_dp(tmp_path):
    """Same init, one train step DP vs FSDP: identical numerics, but the
    FSDP state's large leaves are actually split across devices."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(0)
    image = rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(8, 16, 16, 16)) > 0.7).astype(np.int32)
    modality = np.array([0, 1] * 4, np.int32)
    batch = {"image": image, "label": label, "modality": modality}

    mesh = make_mesh((8,), ("data",))
    t_dp = Trainer(_tiny_cfg(tmp_path / "dp"), mesh=mesh,
                   workdir=str(tmp_path / "dp"))
    s_dp = t_dp.init_state(image[:1], modality[:1])

    t_fs = Trainer(_tiny_cfg(tmp_path / "fs", fsdp=True, fsdp_min_size=128),
                   mesh=mesh, workdir=str(tmp_path / "fs"))
    s_fs = t_fs.init_state(image[:1], modality[:1])

    # placements: some leaves really sharded, small ones replicated
    frac = sharded_fraction(s_fs.params)
    assert frac > 0.5, f"params barely sharded: {frac}"
    assert sharded_fraction(s_dp.params) == 0.0
    # Adam moments follow the params leaf-for-leaf
    assert sharded_fraction(s_fs.opt_state) > 0.0

    # identical numerics after one step (same seed => same init)
    for k in ("params",):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0),
            getattr(s_dp, k), getattr(s_fs, k))
    s_dp2, loss_dp = t_dp.train_step(s_dp, batch)
    s_fs2, loss_fs = t_fs.train_step(s_fs, batch)
    np.testing.assert_allclose(float(loss_dp), float(loss_fs), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        s_dp2.params, s_fs2.params)
    # sharding survives the donated step
    assert sharded_fraction(s_fs2.params) > 0.5


def test_fsdp_per_device_memory_share(tmp_path):
    """The ZeRO claim itself: device 0 holds ~1/8 of param+moment bytes
    (plus the replicated small leaves), not a full replica."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(3)
    image = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    modality = np.zeros((1,), np.int32)
    mesh = make_mesh((8,), ("data",))

    def dev0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if not hasattr(leaf, "addressable_shards"):
                continue
            for sh in leaf.addressable_shards:
                if sh.device == jax.devices()[0]:
                    total += sh.data.nbytes
        return total

    def full_bytes(tree):
        return sum(l.nbytes for l in jax.tree.leaves(tree)
                   if hasattr(l, "nbytes"))

    t = Trainer(_tiny_cfg(tmp_path, fsdp=True, fsdp_min_size=128),
                mesh=mesh, workdir=str(tmp_path))
    s = t.init_state(image, modality)
    for name, tree in (("params", s.params), ("opt_state", s.opt_state)):
        share = dev0_bytes(tree) / full_bytes(tree)
        assert share < 0.2, f"{name}: device 0 holds {share:.0%}, not ~1/8"


def test_hybrid_dp_fsdp_2d_mesh(tmp_path):
    """2-D mesh ("data", "model"): batch sharded on data (4-way DP),
    params sharded on model (2-way FSDP) — hybrid ZeRO, one jit."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(2)
    image = rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)
    label = (rng.uniform(size=(8, 16, 16, 16)) > 0.7).astype(np.int32)
    modality = np.array([0, 1] * 4, np.int32)
    batch = {"image": image, "label": label, "modality": modality}

    mesh2d = make_mesh((4, 2), ("data", "model"))
    cfg = _tiny_cfg(tmp_path / "hy", fsdp=True, fsdp_axis="model",
                    fsdp_min_size=128, mesh_shape=[4, 2],
                    mesh_axes=["data", "model"])
    t_hy = Trainer(cfg, mesh=mesh2d, workdir=str(tmp_path / "hy"))
    s_hy = t_hy.init_state(image[:1], modality[:1])
    assert sharded_fraction(s_hy.params) > 0.5

    mesh1d = make_mesh((8,), ("data",))
    t_dp = Trainer(_tiny_cfg(tmp_path / "dp"), mesh=mesh1d,
                   workdir=str(tmp_path / "dp"))
    s_dp = t_dp.init_state(image[:1], modality[:1])

    s_hy2, loss_hy = t_hy.train_step(s_hy, batch)
    s_dp2, loss_dp = t_dp.train_step(s_dp, batch)
    np.testing.assert_allclose(float(loss_hy), float(loss_dp), rtol=1e-5)
    # 4-way vs 8-way grad reduction changes f32 summation order.  Adam's
    # step-1 update is ~ lr·sign(g), so elements whose grad sits at
    # reduction-noise scale can flip SIGN between the two programs — the
    # per-element bound after one step is 2·lr (2e-4 at lr=1e-4), not a
    # float tolerance (same reasoning as test_tensor_parallel.py; observed
    # here: one near-zero-grad element at 1.25e-5 after the round-5
    # two-pass-variance change reordered the norm-stats sums)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=2.5e-4),
        s_hy2.params, s_dp2.params)


def test_fsdp_eval_matches_dp(tmp_path):
    """Sliding-window eval (mesh window fan-out) under sharded params."""
    from miseg_tpu.train.engine import Trainer

    rng = np.random.default_rng(1)
    image = rng.normal(size=(1, 24, 24, 24, 1)).astype(np.float32)
    modality = np.array([1], np.int32)

    mesh = make_mesh((8,), ("data",))
    t_dp = Trainer(_tiny_cfg(tmp_path / "dp"), mesh=mesh,
                   workdir=str(tmp_path / "dp"))
    s = t_dp.init_state(image[:1], modality)
    out_dp = t_dp.make_inferer()(jnp.asarray(image), jnp.asarray(modality),
                                 (s.params, s.extra_vars))

    t_fs = Trainer(_tiny_cfg(tmp_path / "fs", fsdp=True, fsdp_min_size=128),
                   mesh=mesh, workdir=str(tmp_path / "fs"))
    s_fs = shard_state(s, mesh, min_size=128)
    out_fs = t_fs.make_inferer()(jnp.asarray(image), jnp.asarray(modality),
                                 (s_fs.params, s_fs.extra_vars))
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_fs),
                               rtol=2e-5, atol=1e-5)
