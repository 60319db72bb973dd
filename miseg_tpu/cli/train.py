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
from ..parallel import host_shard_info
from ..train.checkpoint import load_checkpoint
from ..train.engine import Trainer
from ..utils.logging import MetricLogger


def main(cfg: Config | None = None) -> None:
    cfg = cfg or parse_config()
    workdir = os.path.join(cfg.default_root_dir,
                           cfg.experiment_name or cfg.study_name)
    if cfg.auto_scale_batch_size:
        # trainer.tune's batch half — exception-wrapped like the
        # reference's `try: trainer.tune(...)` (train.py:57-60)
        try:
            from ..train.tuner import scale_batch_size
            bs = scale_batch_size(cfg)
            print(f"auto_scale_batch_size: training at batch_size={bs}")
            cfg = cfg.replace(batch_size=bs)
        except Exception as e:  # noqa: BLE001 — parity with train.py:59
            print(f"Tuning of batch size not possible: {e}")
    shard, num_shards = host_shard_info()
    data = MultiModalData(cfg, shard=shard, num_shards=num_shards)
    logger = MetricLogger(workdir, wandb_kwargs=(
        {"project": cfg.project, "entity": cfg.entity, "group": cfg.group,
         "name": cfg.experiment_name, "mode": cfg.wandb_mode, "dir": workdir}
        if cfg.project else None))
    trainer = Trainer(cfg, workdir=workdir, logger=logger)

    # init + optional pretrained ingest before fit
    sample = np.zeros((1, *cfg.roi, cfg.in_channels), np.float32)
    state = trainer.fresh_state(sample, np.zeros((1,), np.int32))

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
