"""CLI-level end-to-end regression tests (slow: full entry-point flows
on synthetic data, minutes of CPU compile)."""

import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.data.nifti import load_nifti
from miseg_tpu.data.synthetic import make_synthetic_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    make_synthetic_dataset(root, shape=(40, 40, 40), num_classes=3)
    cfg = Config(model_name="unet", feature_size=[4], num_layers=2,
                 strides=[2], num_res_units=1, out_channels=3,
                 roi_x=32, roi_y=32, roi_z=32,
                 encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", criterion="dice_ce",
                 data_dirs=[str(root)] * 2, json_lists=["CT.json", "MR.json"],
                 max_epochs=1, batch_size=2, scheduler="none", cache_num=0,
                 use_normal_dataset=True, num_workers=0, no_amp=True,
                 precision="fp32", patience=10,
                 default_root_dir=str(root / "exp"), study_name="s")
    # train once here so each test is independently runnable
    from miseg_tpu.cli import train as train_cli
    train_cli.main(cfg)
    return root, cfg


def test_train_cli_then_test_cli(env):
    from miseg_tpu.cli import test as test_cli
    root, cfg = env
    best = root / "exp" / "s" / "best.ckpt"
    assert best.exists()
    metrics = test_cli.main(cfg.replace(ckpt_path=str(best)))
    # test runs use the test_ namespace (no overwrite of val history)
    assert "test_total_surface_distance/class0" in metrics
    assert not any(k.startswith("val_total") for k in metrics)
    assert np.isfinite(metrics["test/accuracy/avg"])


def test_predict_cli_native_space(env):
    from miseg_tpu.cli import predict_whs
    root, cfg = env
    best = root / "exp" / "s" / "best.ckpt"
    written = predict_whs.main(
        cfg.replace(ckpt_path=str(best), json_lists=["CT.json"],
                    data_dirs=[str(root)]),
        result_dir=str(root / "pred"))
    assert written
    pred = load_nifti(written[0])
    # values remapped to MM-WHS label ids; shape/affine = native space
    assert set(np.unique(pred.data)).issubset({0, 500, 600, 420, 550, 205,
                                               820, 850})
    import os
    src = load_nifti(str(root / "ct_train" /
                         os.path.basename(written[0]).replace("label", "image")))
    assert pred.data.shape == src.data.shape
    assert np.allclose(pred.affine, src.affine, atol=1e-3)


def test_tune_cli_main(env):
    """The tune entry point end-to-end: study creation on journal storage,
    TPE suggestions, ASHA pruner wiring, per-trial fits, best-trial
    report — then the dashboard reads the same journal."""
    root, cfg = env
    tcfg = cfg.replace(default_root_dir=str(root / "tune_exp"),
                       study_name="tune_s", n_trials=2, max_epochs=1,
                       check_val_every_n_epoch=1)
    from miseg_tpu.cli import tune as tune_cli
    study = tune_cli.main(tcfg)
    assert len(study.trials) == 2
    assert study.best_trial is not None
    assert "lr" in study.best_trial.params

    from miseg_tpu.cli.dashboard import study_report
    storage = str(root / "tune_exp" / f"{tcfg.storage_name}.journal.jsonl")
    rep = study_report(storage, "tune_s")
    assert rep["n_trials"] == 2 and rep["direction"] == "maximize"


def test_export_cli_then_http_serve(env, tmp_path):
    """Deployment flow end-to-end from a TRAINED checkpoint: export CLI →
    bundle → HTTP server → native-space NIfTI prediction."""
    import json
    import threading
    import urllib.request

    root, cfg = env
    best = root / "exp" / "s" / "best.ckpt"
    from miseg_tpu.cli import export as export_cli
    bundle = export_cli.main(cfg.replace(ckpt_path=str(best),
                                         export_dir=str(tmp_path / "bundle"),
                                         export_platforms=["cpu"],
                                         export_check=True,
                                         export_volume_shapes=["24x24x24"]))
    # the canonical-shape volume program exported alongside the window fn
    from miseg_tpu.serve import load_bundle
    sm = load_bundle(bundle)
    assert sm._volume_program((24, 24, 24), 1, cfg.infer_overlap,
                              "gaussian") is not None

    from miseg_tpu.cli.serve import make_server
    srv = make_server(bundle, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        with urllib.request.urlopen(f"{base}/health") as r:
            assert json.loads(r.read())["model_name"] == "unet"
        src = root / "ct_train" / "ct_train_1001_image.nii.gz"
        req = urllib.request.Request(f"{base}/predict?modality=0",
                                     data=src.read_bytes(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = r.read()
        dst = tmp_path / "pred.nii.gz"
        dst.write_bytes(out)
        pred = load_nifti(str(dst))
        orig = load_nifti(str(src))
        assert pred.data.shape == orig.data.shape
        assert set(np.unique(pred.data)).issubset(set(range(cfg.out_channels)))
    finally:
        srv.shutdown()


def test_run_cv_two_folds(env, tmp_path):
    """scripts/run_cv.py: both folds train, per-fold metrics are read from
    each experiment dir, and the aggregate means land in cv_summary.json."""
    import importlib.util
    import shutil

    root, cfg = env
    # the CV protocol wants CT_fold{1,2}.json datalists
    for fold in (1, 2):
        shutil.copy(root / "CT.json", root / f"CT_fold{fold}.json")
    spec = importlib.util.spec_from_file_location(
        "run_cv", "/root/repo/scripts/run_cv.py")
    run_cv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_cv)
    cv_cfg = cfg.replace(default_root_dir=str(tmp_path / "cv"),
                         json_lists=["CT_fold1.json", "MR.json"],
                         study_name="cv_s", max_epochs=1)
    agg = run_cv.main(cv_cfg)
    assert any(k.startswith("cv/test/") for k in agg), agg
    import json as _json
    summary = _json.load(open(tmp_path / "cv" / "cv_summary.json"))
    assert len(summary["folds"]) == 2
    assert all(f.get("test/accuracy/avg") is not None for f in summary["folds"])
