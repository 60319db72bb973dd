"""`tune.py` — hyper-parameter optimization (TPE + ASHA).

Reference parity (tune.py:41-353): per-model search spaces
(`set_trial_config`, :41-77), objective = build model → train with
accumulation/AMP → per-validation `trial.report(accuracy, epoch)` + ASHA
pruning (:243-248), best/last checkpoints per trial, TPE sampler +
SuccessiveHalvingPruner(min_resource=4*check_val_every_n_epoch,
reduction_factor=3), resumable storage (`load_if_exists`).

Multi-host: instead of NCCL + TorchDistributedTrial broadcast
(tune.py:81-82, 272-288), host 0 suggests and
`multihost_utils.broadcast_one_to_all` distributes the params; the train
step itself is already mesh-parallel.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from ..config import Config, parse_config
from ..data.multi_modal import MultiModalData
from ..hpo import SuccessiveHalvingPruner, TPESampler, TrialPruned, create_study
from ..parallel import host_shard_info
from ..train.engine import Trainer
from ..utils.logging import MetricLogger


class MultiHostTrial:
    """Host-0-suggests trial proxy (the `TorchDistributedTrial` analog,
    tune.py:81-82): parameter values and prune decisions are broadcast to
    every host with `multihost_utils.broadcast_one_to_all`."""

    def __init__(self, trial):
        self._trial = trial
        self.number = trial.number if trial is not None else -1
        self.params = {}

    def _bcast(self, value: float) -> float:
        import jax
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        arr = jnp.asarray(float(value) if value is not None else 0.0)
        return float(multihost_utils.broadcast_one_to_all(arr))

    def _suggest(self, fn_name, name, *args, **kw):
        import jax
        if jax.process_index() == 0:
            v = getattr(self._trial, fn_name)(name, *args, **kw)
        else:
            v = None
        out = self._bcast(v if isinstance(v, (int, float)) else 0.0)
        self.params[name] = out
        return out

    def suggest_float(self, name, low, high, *, log=False):
        return self._suggest("suggest_float", name, low, high, log=log)

    def suggest_int(self, name, low, high):
        return int(self._suggest("suggest_int", name, low, high))

    def suggest_categorical(self, name, choices):
        idx_choices = list(range(len(choices)))
        import jax
        if jax.process_index() == 0:
            v = self._trial.suggest_categorical(name, list(choices))
            idx = list(choices).index(v)
        else:
            idx = 0
        idx = int(self._bcast(idx))
        self.params[name] = choices[idx]
        return choices[idx]

    def report(self, value, step):
        import jax
        if jax.process_index() == 0:
            self._trial.report(value, step)

    def should_prune(self) -> bool:
        import jax
        if jax.process_index() == 0:
            decision = 1.0 if self._trial.should_prune() else 0.0
        else:
            decision = 0.0
        return bool(self._bcast(decision))


def set_trial_config(trial, cfg: Config) -> Config:
    """Per-model search space (tune.py:41-77)."""
    over: dict = {
        "lr": trial.suggest_float("lr", cfg.min_lr, cfg.max_lr, log=True),
        "reg_weight": trial.suggest_float("reg_weight", 1e-6, 1e-4),
    }
    if cfg.scheduler == "warmup_cosine":
        over["warmup_epochs"] = trial.suggest_int(
            "warmup_epochs", 0, 3 * cfg.check_val_every_n_epoch)
    elif cfg.scheduler == "cosine":
        over["t_max"] = trial.suggest_int("t_max", 400, cfg.max_epochs)
    elif cfg.scheduler == "reduce_on_plateau":
        over["patience_scheduler"] = trial.suggest_int("patience_scheduler", 2, 10)
    if not cfg.freeze_encoder and not cfg.pretrained:
        if cfg.model_name == "unet":
            over["feature_size"] = [trial.suggest_categorical(
                "feature_size", [8, 16, 32])]
            n = trial.suggest_int("num_layers", 3, 5)
            over["num_layers"] = n
            over["strides"] = [2] * (n - 1)
        elif cfg.model_name == "unetr":
            over["feature_size"] = [trial.suggest_categorical(
                "feature_size", [8, 16, 32])]
            over["num_heads"] = trial.suggest_categorical("num_heads", [8, 12, 16])
        elif cfg.model_name in ("swin_unetr", "pre_swin_unetr"):
            over["feature_size"] = [trial.suggest_categorical(
                "feature_size", [12, 24, 36])]
            over["num_heads"] = trial.suggest_categorical("num_heads", [2, 3, 4])
    return cfg.replace(**over)


def objective(base_cfg: Config, trial) -> float:
    import jax
    if jax.process_count() > 1:
        trial = MultiHostTrial(trial)
    cfg = set_trial_config(trial, base_cfg)
    logdir = os.path.join(cfg.default_root_dir, cfg.study_name,
                          str(trial.number))
    Path(logdir).mkdir(parents=True, exist_ok=True)
    with open(os.path.join(logdir, "params.json"), "w") as f:
        json.dump(trial.params, f)
    shard, num_shards = host_shard_info()
    data = MultiModalData(cfg, shard=shard, num_shards=num_shards)
    logger = MetricLogger(logdir, wandb_kwargs=(
        {"project": cfg.project, "entity": cfg.entity, "group": cfg.study_name,
         "id": f"{cfg.study_name}_{trial.number}", "mode": cfg.wandb_mode,
         "dir": logdir} if cfg.project else None))
    trainer = Trainer(cfg, workdir=logdir, logger=logger)

    best = {"acc": -1.0, "pruned": False}

    def report(epoch: int, acc: float) -> bool:
        best["acc"] = max(best["acc"], acc)
        trial.report(acc, epoch)
        if trial.should_prune():
            best["pruned"] = True
            return True
        return False

    trainer.fit(data, report_callback=report)
    logger.finish()
    if best["pruned"]:
        raise TrialPruned()
    return best["acc"]


def main(cfg: Config | None = None):
    cfg = cfg or parse_config()
    storage = os.path.join(cfg.default_root_dir,
                           f"{cfg.storage_name}.journal.jsonl")
    study = create_study(
        study_name=cfg.study_name, storage=storage,
        sampler=TPESampler(seed=cfg.seed),
        pruner=SuccessiveHalvingPruner(
            min_resource=4 * cfg.check_val_every_n_epoch, reduction_factor=3),
        direction="maximize", load_if_exists=True)
    study.optimize(lambda t: objective(cfg, t), n_trials=cfg.n_trials,
                   timeout=cfg.timeout)
    best = study.best_trial
    if best is not None:
        print(f"best trial #{best.number}: value={best.value:.4f} "
              f"params={best.params}")
    return study


if __name__ == "__main__":
    main()
