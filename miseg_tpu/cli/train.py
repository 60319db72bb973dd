"""`train.py` — fit + test entry point.

Reference parity (train.py:1-86): parse args → data module + model →
wandb logger + EarlyStopping(val/accuracy/avg, max, patience, min_delta) +
LR monitor + ModelCheckpoint(top-k, last) → fit(ckpt_path) → test on the
best checkpoint.  The PTL Trainer flags collapse into `Config`
(max_epochs, check_val_every_n_epoch, precision).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config, parse_config
from ..data.multi_modal import MultiModalData
from ..models import model_from_config
from ..parallel import host_shard_info
from ..train.checkpoint import load_checkpoint
from ..train.engine import Trainer
from ..train.pretrained import load_swin_vit_torch, partial_load
from ..utils.logging import MetricLogger


def apply_pretrained(trainer: Trainer, state, cfg: Config):
    """pre_swin ingest + --pretrained partial load (utils.py:17-64)."""
    params = state.params
    if cfg.model_name == "pre_swin_unetr":
        if not cfg.pre_swin:
            raise ValueError("pre_swin_unetr requires --pre_swin checkpoint path")
        params = load_swin_vit_torch(cfg.pre_swin, params)
        print("Loaded pre-trained Swin-ViT")
    if cfg.pretrained:
        print("Loading pre-trained weights ...")
        params = load_any_checkpoint_params(cfg.pretrained, params)
    return state.replace(params=params)


def load_any_checkpoint_params(path: str, params):
    """Load ours (.ckpt msgpack) or a reference torch .pt/.ckpt into params."""
    try:
        ck = load_checkpoint(path)
        return partial_load(params, ck["params"])
    except Exception:
        from ..train.torch_import import load_reference_checkpoint
        return load_reference_checkpoint(path, params)


def main(cfg: Config | None = None) -> None:
    cfg = cfg or parse_config()
    workdir = os.path.join(cfg.default_root_dir,
                           cfg.experiment_name or cfg.study_name)
    shard, num_shards = host_shard_info()
    data = MultiModalData(cfg, shard=shard, num_shards=num_shards)
    logger = MetricLogger(workdir, wandb_kwargs=(
        {"project": cfg.project, "entity": cfg.entity, "group": cfg.group,
         "name": cfg.experiment_name, "mode": cfg.wandb_mode, "dir": workdir}
        if cfg.project else None))
    trainer = Trainer(cfg, workdir=workdir, logger=logger)

    # init + optional pretrained ingest before fit
    roi = cfg.roi
    sample = np.zeros((1, *roi, cfg.in_channels), np.float32)
    state = trainer.init_state(sample, np.zeros((1,), np.int32))
    state = apply_pretrained(trainer, state, cfg)

    state = trainer.fit(data, state=state)

    # test on the best checkpoint (train.py:67)
    best = os.path.join(workdir, "best.ckpt")
    if os.path.exists(best):
        ck = load_checkpoint(best, params_template=state.params)
        state = state.replace(params=ck["params"])
    metrics = trainer.evaluate(data.test_dataloader(), state, prefix="test",
                               compute_surface=True)
    print({k: round(v, 4) for k, v in metrics.items()})
    logger.finish()


if __name__ == "__main__":
    main()
