"""Pipeline parallelism (GPipe over a "pp" mesh axis) on the 8-device
CPU mesh.

The reference has no PP (SURVEY §2.8 row "PP": absent); `parallel/
pipeline.py` provides the GPipe schedule as the last missing mesh
dimension of the parallel/ family.  Certified here: (a) the schedule
computes exactly what the serial layer stack computes — every stage
boundary, not just the final output; (b) `jax.grad` through the
pipeline matches serial grads (ppermute transposes correctly); (c) a
real transformer stack with conditional norms pipelines, with the
`modalities` side input microbatched alongside the tokens; (d) hybrid
DP x PP on a 2-D mesh; (e) the ViT stage boundaries are UNETR's hidden
states (3/6/9/12 for 12 layers on 4 stages)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miseg_tpu.nn.transformer import TransformerBlock
from miseg_tpu.parallel import make_mesh
from miseg_tpu.parallel.pipeline import (pipeline_apply,
                                         place_pipeline_params,
                                         stack_stages)


def _affine_stage(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _layer_params(rng, n_layers, width):
    return [{"w": jnp.asarray(rng.normal(size=(width, width)) * 0.3,
                              jnp.float32),
             "b": jnp.asarray(rng.normal(size=(width,)), jnp.float32)}
            for _ in range(n_layers)]


def _serial(layers, x):
    outs = []
    h = x
    for p in layers:
        h = _affine_stage(p, h)
        outs.append(h)
    return outs


def test_pipeline_matches_serial_every_stage(rng):
    n_stages, batch, width = 4, 8, 16
    mesh = make_mesh((-1, n_stages), ("data", "pp"))
    layers = _layer_params(rng, n_stages, width)
    stacked = place_pipeline_params(stack_stages(layers, n_stages), mesh)
    x = jnp.asarray(rng.normal(size=(batch, width)), jnp.float32)

    def stage_fn(p, h):
        return _affine_stage(jax.tree.map(lambda a: a[0], p), h)

    ys = pipeline_apply(stage_fn, stacked, x, mesh=mesh, microbatches=4)
    assert ys.shape == (n_stages, batch, width)
    want = _serial(layers, x)
    for s in range(n_stages):
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(want[s]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("microbatches", [1, 2, 8])
def test_pipeline_microbatch_counts(rng, microbatches):
    mesh = make_mesh((-1, 4), ("data", "pp"))
    layers = _layer_params(rng, 4, 8)
    stacked = place_pipeline_params(stack_stages(layers, 4), mesh)
    x = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)

    def stage_fn(p, h):
        return _affine_stage(jax.tree.map(lambda a: a[0], p), h)

    ys = pipeline_apply(stage_fn, stacked, x, mesh=mesh,
                        microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(ys[-1]),
                               np.asarray(_serial(layers, x)[-1]),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_serial(rng):
    n_stages, batch, width = 4, 8, 12
    mesh = make_mesh((-1, n_stages), ("data", "pp"))
    layers = _layer_params(rng, n_stages, width)
    stacked = stack_stages(layers, n_stages)
    x = jnp.asarray(rng.normal(size=(batch, width)), jnp.float32)

    def stage_fn(p, h):
        return _affine_stage(jax.tree.map(lambda a: a[0], p), h)

    def loss_pp(sp):
        ys = pipeline_apply(stage_fn, sp, x, mesh=mesh, microbatches=4)
        return jnp.mean(ys[-1] ** 2)

    def loss_serial(sp):
        per = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), sp)
        h = x
        for i in range(n_stages):
            h = _affine_stage(jax.tree.map(lambda a: a[i], per), h)
        return jnp.mean(h ** 2)

    g_pp = jax.grad(loss_pp)(place_pipeline_params(stacked, mesh))
    g_serial = jax.grad(loss_serial)(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g_pp, g_serial)


def _vit_stack(rng, n_layers=4, hidden=16, heads=2):
    block = TransformerBlock(hidden_size=hidden, mlp_dim=2 * hidden,
                             num_heads=heads,
                             norm=("instance_cond",
                                   {"num_styles": 2, "affine": True}))
    x0 = jnp.zeros((1, 6, hidden), jnp.float32)
    m0 = jnp.zeros((1,), jnp.int32)
    layers = [block.init({"params": jax.random.key(i)}, x0, m0)["params"]
              for i in range(n_layers)]
    return block, layers


def test_transformer_stack_pipelines_with_modalities(rng):
    """A conditional-norm ViT stack: stage boundaries == UNETR hidden
    states; the per-sample modalities ride along as a microbatched side
    input (reference threads them into every block,
    networks/nets/vit.py:254-276 analog)."""
    n_stages, n_layers, batch, tokens, hidden = 2, 4, 4, 6, 16
    mesh = make_mesh((-1, n_stages), ("data", "pp"))
    block, layers = _vit_stack(rng, n_layers, hidden)
    stacked = place_pipeline_params(stack_stages(layers, n_stages), mesh)
    x = jnp.asarray(rng.normal(size=(batch, tokens, hidden)), jnp.float32)
    mods = jnp.asarray([0, 1, 1, 0], jnp.int32)

    def stage_fn(p, h, m):
        for i in range(n_layers // n_stages):
            h = block.apply({"params": jax.tree.map(lambda a: a[i], p)},
                            h, m, train=False)
        return h

    ys = pipeline_apply(stage_fn, stacked, x, mods, mesh=mesh,
                        microbatches=2)

    h = x
    hidden_states = []
    for p in layers:
        h = block.apply({"params": p}, h, mods, train=False)
        hidden_states.append(h)
    # stage outputs are hidden states at layers (L/S)*(s+1) - 1
    per = n_layers // n_stages
    for s in range(n_stages):
        np.testing.assert_allclose(np.asarray(ys[s]),
                                   np.asarray(hidden_states[per * (s + 1) - 1]),
                                   rtol=1e-4, atol=1e-5)


def test_hybrid_dp_pp(rng):
    """2-D ("data", "pp") mesh: batch sharded on data, stages on pp."""
    mesh = make_mesh((2, 4), ("data", "pp"))
    layers = _layer_params(rng, 4, 8)
    stacked = stack_stages(layers, 4)
    x = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)

    def stage_fn(p, h):
        return _affine_stage(jax.tree.map(lambda a: a[0], p), h)

    ys = pipeline_apply(stage_fn, stacked, x, mesh=mesh, microbatches=2,
                        data_axis="data")
    np.testing.assert_allclose(np.asarray(ys[-1]),
                               np.asarray(_serial(layers, x)[-1]),
                               rtol=1e-5, atol=1e-5)


def test_uneven_layers_rejected(rng):
    with pytest.raises(ValueError, match="do not split"):
        stack_stages(_layer_params(rng, 5, 4), 2)


# ---------------------------------------------------------------- UNETR PP

def _tiny_unetr(num_layers=4):
    from miseg_tpu.models.unetr import UNETR
    # round-5 shrink (VERDICT r4 #5): hidden 32->16, mlp 64->32, heads
    # 4->2, fs 8->4 — same structure/assertions, smaller XLA programs on
    # the 1-core suite host
    return UNETR(in_channels=1, out_channels=3, img_size=(32, 32, 32),
                 feature_size=4, hidden_size=16, mlp_dim=32, num_heads=2,
                 num_layers=num_layers,
                 vit_norm=("instance_cond", {"num_styles": 2, "affine": True}),
                 encoder_norm=("instance_cond",
                               {"num_styles": 2, "affine": True}),
                 decoder_norm=("instance", {"affine": True}))


@pytest.mark.parametrize("n_pp", [2, 4])
def test_unetr_pp_forward_matches_serial(rng, n_pp):
    """Pipelined UNETR == serial UNETR, incl. the mid-stage hidden-state
    taps (L=4 on 2 stages puts taps 1 and 3 INSIDE stages — the aux
    channel, not stage boundaries)."""
    from miseg_tpu.models.unetr_pp import unetr_pipeline_forward
    model = _tiny_unetr()
    mesh = make_mesh((8 // n_pp, n_pp), ("data", "pp"))
    # per-device batch = 8 / n_dp must divide pp_microbatches=2
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 32, 1)), jnp.float32)
    mods = jnp.asarray(np.arange(8) % 2, jnp.int32)
    params = model.init({"params": jax.random.key(0)}, x[:1], mods[:1])["params"]
    want = model.apply({"params": params}, x, mods)
    got = unetr_pipeline_forward(model, params, x, mods, mesh=mesh,
                                 microbatches=2, data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_unetr_pp_grads_match_serial(rng):
    # slow: the two full-model grad compiles dominate the quick suite on
    # the 1-core host (~430 s); quick keeps grad equality on the generic
    # schedule (test_pipeline_grads_match_serial) + full-model FORWARD
    # parity, and the multichip dryrun drives the real PP train step
    from miseg_tpu.models.unetr_pp import unetr_pipeline_forward
    model = _tiny_unetr()
    mesh = make_mesh((4, 2), ("data", "pp"))
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 32, 1)), jnp.float32)
    mods = jnp.asarray(np.arange(8) % 2, jnp.int32)
    params = model.init({"params": jax.random.key(0)}, x[:1], mods[:1])["params"]

    def loss_pp(p):
        return jnp.mean(unetr_pipeline_forward(
            model, p, x, mods, mesh=mesh, microbatches=2,
            data_axis="data") ** 2)

    def loss_serial(p):
        return jnp.mean(model.apply({"params": p}, x, mods) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_serial = jax.grad(loss_serial)(params)
    # f32 through two different program structures: near-zero elements
    # carry O(1e-5) absolute reassociation noise
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5), g_pp, g_serial)


@pytest.mark.slow
def test_trainer_pipeline_parallel_loss_matches_dp(rng):
    """`Config.pipeline_parallel` drives a REAL UNETR train step under
    DP x PP; first-step loss must match the pure-DP trainer.  (slow:
    two train-step compiles; the dryrun PP leg covers this per round)"""
    import tempfile
    from miseg_tpu.config import Config
    from miseg_tpu.train.engine import Trainer

    kw = dict(model_name="unetr", out_channels=3, feature_size=[4],
              hidden_size=16, mlp_dim=32, num_heads=2,
              roi_x=32, roi_y=32, roi_z=32,
              vit_norm_name="instance_cond",
              encoder_norm_name="instance_cond",
              decoder_norm_name="instance", criterion="dice_focal",
              optim_name="adamw", lr=1e-3)
    image = np.asarray(rng.normal(size=(8, 32, 32, 32, 1)), np.float32)
    label = np.asarray(rng.integers(0, 3, (8, 32, 32, 32)), np.int32)
    mods = (np.arange(8) % 2).astype(np.int32)
    batch = {"image": image, "label": label, "modality": mods}

    t_dp = Trainer(Config(**kw), mesh=make_mesh((8,), ("data",)),
                   workdir=tempfile.mkdtemp())
    # UNETR pins num_layers=12 via the factory (reference parity) — too
    # big for this test; swap in the tiny 4-layer model on both trainers
    t_dp.model = _tiny_unetr()
    s_dp = t_dp.init_state(image[:1], mods[:1])
    params0 = jax.tree.map(np.asarray, jax.device_get(s_dp.params))
    s_dp, loss_dp = t_dp.train_step(s_dp, batch)

    t_pp = Trainer(Config(pipeline_parallel=True, pp_microbatches=2,
                          mesh_shape=[2, 4], mesh_axes=["data", "pp"], **kw),
                   mesh=make_mesh((2, 4), ("data", "pp")),
                   workdir=tempfile.mkdtemp())
    t_pp.model = _tiny_unetr()
    s_pp = t_pp.init_state(image[:1], mods[:1], params=params0)
    s_pp, loss_pp = t_pp.train_step(s_pp, batch)
    np.testing.assert_allclose(float(loss_pp), float(loss_dp), rtol=1e-4)


# ------------------------------------------------------------- SwinUNETR PP

def _tiny_swin():
    from miseg_tpu.models.swin_unetr import SwinUNETR
    return SwinUNETR(
        img_size=(32, 32, 32), in_channels=1, out_channels=3,
        depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), feature_size=12,
        vit_norm=("instance_cond", {"num_styles": 2, "affine": True}),
        encoder_norm=("instance_cond", {"num_styles": 2, "affine": True}),
        decoder_norm=("instance", {"affine": True}))


def _synth_params(model, x, mods, scale=0.05):
    """eval_shape + host randoms: skips the multi-minute jitted flax init
    (parity needs SOME weights, not the init distribution)."""
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, x[:1],
                           mods[:1]))["params"]
    r = np.random.default_rng(0)
    return jax.tree.map(
        lambda a: jnp.asarray(scale * r.standard_normal(a.shape), a.dtype),
        shapes)


def test_swin_pp_forward_matches_serial(rng):
    """Pipelined SwinUNETR == serial SwinUNETR: the four shape-changing
    BasicLayer stages ride the heterogeneous GPipe (canonical flat
    buffer + lax.switch stage bodies, models/swin_unetr_pp.py), taps at
    every stage boundary feed the conv decoder."""
    from miseg_tpu.models.swin_unetr_pp import swin_unetr_pipeline_forward
    model = _tiny_swin()
    mesh = make_mesh((2, 4), ("data", "pp"))
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 32, 1)), jnp.float32)
    mods = jnp.asarray([0, 1, 1, 0], jnp.int32)
    params = _synth_params(model, x, mods)
    want = model.apply({"params": params}, x, mods)
    got = swin_unetr_pipeline_forward(model, params, x, mods, mesh=mesh,
                                      microbatches=2, data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_swin_pp_grads_match_serial(rng):
    from miseg_tpu.models.swin_unetr_pp import swin_unetr_pipeline_forward
    model = _tiny_swin()
    mesh = make_mesh((2, 4), ("data", "pp"))
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 32, 1)), jnp.float32)
    mods = jnp.asarray([0, 1, 1, 0], jnp.int32)
    params = _synth_params(model, x, mods)

    def loss_pp(p):
        return jnp.mean(swin_unetr_pipeline_forward(
            model, p, x, mods, mesh=mesh, microbatches=2,
            data_axis="data") ** 2)

    def loss_serial(p):
        return jnp.mean(model.apply({"params": p}, x, mods) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_serial = jax.grad(loss_serial)(params)
    # f32 reassociation noise through two program structures (instance-
    # norm stat reductions reorder); near-zero elements carry the atol
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4), g_pp, g_serial)


@pytest.mark.slow
def test_trainer_swin_pipeline_parallel_loss_matches_dp(rng):
    """`Config.pipeline_parallel` drives a REAL SwinUNETR (flagship
    family) train step under DP x PP; first-step loss must match the
    pure-DP trainer."""
    import tempfile
    from miseg_tpu.config import Config
    from miseg_tpu.train.engine import Trainer

    kw = dict(model_name="swin_unetr", out_channels=3, feature_size=[12],
              num_heads=1, depth_swin_block=[1],
              roi_x=32, roi_y=32, roi_z=32,
              vit_norm_name="instance_cond",
              encoder_norm_name="instance_cond",
              decoder_norm_name="instance", criterion="dice_focal",
              optim_name="adamw", lr=1e-3)
    image = np.asarray(rng.normal(size=(8, 32, 32, 32, 1)), np.float32)
    label = np.asarray(rng.integers(0, 3, (8, 32, 32, 32)), np.int32)
    mods = (np.arange(8) % 2).astype(np.int32)
    batch = {"image": image, "label": label, "modality": mods}

    t_dp = Trainer(Config(**kw), mesh=make_mesh((8,), ("data",)),
                   workdir=tempfile.mkdtemp())
    s_dp = t_dp.init_state(image[:1], mods[:1])
    params0 = jax.tree.map(np.asarray, jax.device_get(s_dp.params))
    s_dp, loss_dp = t_dp.train_step(s_dp, batch)

    t_pp = Trainer(Config(pipeline_parallel=True, pp_microbatches=2,
                          mesh_shape=[2, 4], mesh_axes=["data", "pp"], **kw),
                   mesh=make_mesh((2, 4), ("data", "pp")),
                   workdir=tempfile.mkdtemp())
    s_pp = t_pp.init_state(image[:1], mods[:1], params=params0)
    s_pp, loss_pp = t_pp.train_step(s_pp, batch)
    np.testing.assert_allclose(float(loss_pp), float(loss_dp), rtol=1e-4)


def test_swin_pp_rejects_wrong_stage_count(rng):
    from miseg_tpu.models.swin_unetr_pp import swin_unetr_pipeline_forward
    model = _tiny_swin()
    mesh = make_mesh((4, 2), ("data", "pp"))
    x = jnp.zeros((4, 32, 32, 32, 1), jnp.float32)
    mods = jnp.zeros((4,), jnp.int32)
    with pytest.raises(ValueError, match="4 stages"):
        swin_unetr_pipeline_forward(model, {}, x, mods, mesh=mesh,
                                    microbatches=2)
