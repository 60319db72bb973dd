"""Slow end-to-end behaviors: learning actually happens; HPO loop runs;
LR finder runs (marked slow — minutes of CPU compile)."""

import numpy as np
import pytest

from miseg_tpu.config import Config
from miseg_tpu.data.multi_modal import MultiModalData
from miseg_tpu.data.synthetic import make_synthetic_dataset
from miseg_tpu.train.engine import Trainer

pytestmark = pytest.mark.slow


def _cfg(tmp_path, **kw):
    base = dict(model_name="unet", roi_x=24, roi_y=24, roi_z=24,
                out_channels=2, feature_size=[4], num_layers=2, strides=[2],
                num_res_units=1, encoder_norm_name="instance_cond",
                decoder_norm_name="instance", criterion="dice_ce",
                data_dirs=[str(tmp_path)] * 2,
                json_lists=["CT.json", "MR.json"], batch_size=2,
                patches_training_sample=2, scheduler="none", lr=3e-3,
                cache_num=4, num_workers=0, no_amp=True, precision="fp32",
                patience=100, default_root_dir=str(tmp_path / "exp"))
    base.update(kw)
    return Config(**base)


def test_training_improves_dice(tmp_path):
    make_synthetic_dataset(tmp_path, shape=(32, 32, 32), num_classes=2,
                           n_train=2, n_val=1)
    cfg = _cfg(tmp_path, max_epochs=12, check_val_every_n_epoch=4)
    trainer = Trainer(cfg, workdir=str(tmp_path / "exp"))
    data = MultiModalData(cfg)
    m0 = None
    state = None
    # capture dice before and after training
    first = next(iter(data.train_dataloader()))
    state = trainer.init_state(first["image"][:1],
                               np.asarray(first["modality"])[:1])
    m0 = trainer.evaluate(data.val_dataloader(), state)["val/accuracy/avg"]
    state = trainer.fit(data, state=state)
    m1 = trainer.evaluate(data.val_dataloader(), state)["val/accuracy/avg"]
    assert m1 > m0 + 0.05, (m0, m1)


def test_tune_loop_runs(tmp_path):
    from miseg_tpu.cli.tune import objective
    from miseg_tpu.hpo import TPESampler, create_study
    make_synthetic_dataset(tmp_path, shape=(32, 32, 32), num_classes=2,
                           n_train=1, n_val=1)
    cfg = _cfg(tmp_path, max_epochs=1, check_val_every_n_epoch=1,
               study_name="t", freeze_encoder=False)
    study = create_study(storage=str(tmp_path / "j.jsonl"),
                         sampler=TPESampler(seed=0))
    study.optimize(lambda t: objective(cfg, t), n_trials=2)
    assert len(study.trials) == 2
    assert all(t.value is not None for t in study.trials)


def test_find_best_lr_runs(tmp_path):
    from miseg_tpu.cli.find_best_lr import lr_find
    make_synthetic_dataset(tmp_path, shape=(32, 32, 32), num_classes=2,
                           n_train=1, n_val=1)
    cfg = _cfg(tmp_path, max_epochs=1)
    result = lr_find(cfg, num_steps=6, min_lr=1e-6, max_lr=1e-2)
    assert len(result["losses"]) >= 3
    assert 1e-7 < result["lr"] < 1e-1
