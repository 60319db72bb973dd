"""AOT export/serving bundle (serve.py): StableHLO round-trip.

No reference analog (its deployment is predict_whs.py inside the full
torch stack); this certifies the TPU-native serving path: export a
trained model to a versioned bundle, reload it WITHOUT model code, and
get identical window forwards and identical sliding-window volume
predictions (the imported program re-jits inside the inferer).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from miseg_tpu.config import Config
from miseg_tpu.models import model_from_config
from miseg_tpu.serve import export_bundle, load_bundle


@pytest.fixture(scope="module")
def tiny():
    cfg = Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                 out_channels=2, feature_size=[8], num_layers=2, strides=[2],
                 num_res_units=1, encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", no_amp=True, precision="fp32")
    model = model_from_config(cfg)
    x = np.zeros((1, 16, 16, 16, 1), np.float32)
    variables = model.init({"params": jax.random.key(0)}, x,
                           np.zeros((1,), np.int32))
    return cfg, model, variables["params"]


def test_bundle_roundtrip_window_forward(tiny, tmp_path):
    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",))
    assert (out / "window_fn.jax").exists()
    assert (out / "params.ckpt").exists()
    meta = json.loads((out / "meta.json").read_text())
    assert meta["roi"] == [16, 16, 16] and meta["out_channels"] == 2

    served = load_bundle(out)
    rng = np.random.default_rng(1)
    window = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    for mod in (0, 1):
        mods = np.full((1,), mod, np.int32)
        got = np.asarray(served(window, mods))
        want = np.asarray(model.apply({"params": params}, window, mods,
                                      train=False))
        # imported-module and live-jit programs fuse (and round)
        # independently; observed 1.6e-6 on a single element
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bundle_volume_predict_matches_inferer(tiny, tmp_path):
    from miseg_tpu.inferers import SlidingWindowInferer

    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",))
    served = load_bundle(out)

    rng = np.random.default_rng(2)
    vol = rng.normal(size=(1, 24, 24, 24, 1)).astype(np.float32)
    mods = np.ones((1,), np.int32)
    got = np.asarray(served.predict(vol, mods, mode="constant"))

    ref = SlidingWindowInferer(
        lambda p, w, m: model.apply({"params": p}, w, m, train=False),
        roi_size=cfg.roi, sw_batch_size=1, overlap=cfg.infer_overlap,
        mode="constant", out_channels=cfg.out_channels)
    want = np.asarray(ref(jnp.asarray(vol), jnp.asarray(mods), params))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_platform_lowering_from_cpu_host(tiny, tmp_path):
    """A CPU host can produce a TPU+CPU artifact (cross-platform AOT)."""
    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle",
                        platforms=("tpu", "cpu"))
    served = load_bundle(out)
    assert served.meta["platforms"] == ["tpu", "cpu"]
    # still callable on this (CPU) host because "cpu" is among the targets
    window = np.zeros((1, 16, 16, 16, 1), np.float32)
    np.asarray(served(window, np.zeros((1,), np.int32)))


def test_amp_bundle_stores_compute_dtype_params(tiny, tmp_path):
    """With amp, params ship ALREADY in bf16: the serving side never
    updates them, f32 masters would double the artifact, and the
    in-program cast folds to an identity."""
    import jax.numpy as jnp

    cfg, model, params = tiny
    out = export_bundle(cfg.replace(no_amp=False, precision="bf16"), params,
                        tmp_path / "bundle", platforms=("cpu",))
    from miseg_tpu.serve import load_bundle
    served = load_bundle(out)
    assert served.meta["params_dtype"] == "bfloat16"
    leaves = jax.tree.leaves(served.params)
    assert all(leaf.dtype == jnp.bfloat16 for leaf in leaves
               if jnp.issubdtype(leaf.dtype, jnp.floating))
    window = np.random.default_rng(5).normal(
        size=(1, 16, 16, 16, 1)).astype(np.float32)
    mods = np.zeros((1,), np.int32)
    got = np.asarray(served(window, mods))
    want = np.asarray(model.apply({"params": params}, window, mods,
                                  train=False))
    # bf16 compute vs the f32 live forward: loose tolerance
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)


def test_bundle_version_guard(tiny, tmp_path):
    cfg, _, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",))
    meta = json.loads((out / "meta.json").read_text())
    meta["bundle_version"] = 99
    (out / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer"):
        load_bundle(out)


def test_volume_level_export_fast_path(tiny, tmp_path):
    """A whole-volume exported program serves matching shapes with zero
    interior module boundaries (serve.py volume_programs); non-matching
    shapes fall back to the window-level path.  Both must agree with the
    live inferer."""
    from miseg_tpu.inferers import SlidingWindowInferer

    cfg, model, params = tiny
    # 20^3 is deliberately NOT grid-aligned: exercises the symmetric
    # pad + crop inside the exported program
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",),
                        volume_shapes=[(20, 20, 20)])
    meta = json.loads((out / "meta.json").read_text())
    assert meta["volume_programs"] == [{
        "tag": "20x20x20", "spatial": [20, 20, 20], "batch": 1,
        "mode": "gaussian", "overlap": cfg.infer_overlap,
        "params_baked": False}]
    assert (out / "volume_20x20x20.jax").exists()
    assert (out / "volume_20x20x20.npz").exists()

    served = load_bundle(out)
    rng = np.random.default_rng(3)
    ref = SlidingWindowInferer(
        lambda p, w, m: model.apply({"params": p}, w, m, train=False),
        roi_size=cfg.roi, sw_batch_size=1, overlap=cfg.infer_overlap,
        mode="gaussian", out_channels=cfg.out_channels)

    # fast path: matching shape routes through the volume program
    vol = rng.normal(size=(1, 20, 20, 20, 1)).astype(np.float32)
    mods = np.ones((1,), np.int32)
    assert served._volume_program((20, 20, 20), 1,
                                  cfg.infer_overlap, "gaussian") is not None
    got = np.asarray(served.predict(vol, mods))
    want = np.asarray(ref(jnp.asarray(vol), jnp.asarray(mods), params))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # mismatches (shape / mode / overlap) fall back to the window path
    assert served._volume_program((24, 24, 24), 1,
                                  cfg.infer_overlap, "gaussian") is None
    assert served._volume_program((20, 20, 20), 1,
                                  cfg.infer_overlap, "constant") is None
    assert served._volume_program((20, 20, 20), 1, 0.25, "gaussian") is None
    vol2 = rng.normal(size=(1, 24, 24, 24, 1)).astype(np.float32)
    got2 = np.asarray(served.predict(vol2, mods))
    want2 = np.asarray(ref(jnp.asarray(vol2), jnp.asarray(mods), params))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_volume_export_baked_params(tiny, tmp_path):
    """bake_params=True embeds the weights as module constants: the
    volume program takes no params argument, predict() still routes
    through it, and outputs match the argument-convention program."""
    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "baked", platforms=("cpu",),
                        volume_shapes=[(20, 20, 20)], bake_params=True)
    meta = json.loads((out / "meta.json").read_text())
    assert meta["volume_programs"][0]["params_baked"] is True
    out_arg = export_bundle(cfg, params, tmp_path / "arg", platforms=("cpu",),
                            volume_shapes=[(20, 20, 20)])

    from miseg_tpu.serve import load_bundle as _lb
    baked, arg = _lb(out), _lb(out_arg)
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(1, 20, 20, 20, 1)).astype(np.float32)
    mods = np.zeros((1,), np.int32)
    assert baked._volume_program((20, 20, 20), 1,
                                 cfg.infer_overlap, "gaussian") is not None
    got = np.asarray(baked.predict(vol, mods))
    want = np.asarray(arg.predict(vol, mods))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_baked_window_program_fallback(tiny, tmp_path):
    """bake_params=True also exports a baked WINDOW program
    (window_fn_baked.jax): __call__ and the every-shape predict fallback
    route through it (weights as module constants — closes the measured
    0.83x params-as-arguments steady state for non-canonical shapes,
    VERDICT r4 #7) and match the live model."""
    from miseg_tpu.inferers import SlidingWindowInferer

    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",),
                        bake_params=True)
    assert (out / "window_fn_baked.jax").exists()
    meta = json.loads((out / "meta.json").read_text())
    assert meta["window_baked"] is True

    served = load_bundle(out)
    assert served._exported_baked is not None
    rng = np.random.default_rng(6)
    window = rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    mods = np.zeros((1,), np.int32)
    got = np.asarray(served(window, mods))
    want = np.asarray(model.apply({"params": params}, window, mods,
                                  train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # arbitrary (non-exported) volume shape: the fallback inferer traces
    # the BAKED window program and must match the live inferer
    vol = rng.normal(size=(1, 24, 20, 24, 1)).astype(np.float32)
    ref = SlidingWindowInferer(
        lambda p, w, m: model.apply({"params": p}, w, m, train=False),
        roi_size=cfg.roi, sw_batch_size=1, overlap=cfg.infer_overlap,
        mode="gaussian", out_channels=cfg.out_channels)
    got2 = np.asarray(served.predict(vol, mods))
    want2 = np.asarray(ref(jnp.asarray(vol), jnp.asarray(mods), params))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_fallback_warning_logged_once(tiny, tmp_path, caplog):
    """A non-baked bundle warns LOUDLY (once per volume shape) when
    predict falls back to the params-as-arguments window path — the 17%
    steady-state loss can no longer be hit silently (VERDICT r4 #7)."""
    import logging

    cfg, model, params = tiny
    out = export_bundle(cfg, params, tmp_path / "bundle", platforms=("cpu",))
    served = load_bundle(out)
    vol = np.zeros((1, 20, 20, 20, 1), np.float32)
    mods = np.zeros((1,), np.int32)
    with caplog.at_level(logging.WARNING, logger="miseg_tpu.serve"):
        served.predict(vol, mods)
        served.predict(vol, mods)  # same shape: logged once
    warned = [r for r in caplog.records if "0.83x" in r.getMessage()]
    assert len(warned) == 1
    # a baked bundle stays quiet on the same fallback
    out_b = export_bundle(cfg, params, tmp_path / "baked", platforms=("cpu",),
                          bake_params=True)
    served_b = load_bundle(out_b)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="miseg_tpu.serve"):
        served_b.predict(vol, mods)
    assert not [r for r in caplog.records if "0.83x" in r.getMessage()]
