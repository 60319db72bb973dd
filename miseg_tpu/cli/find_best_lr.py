"""`find_best_lr.py` — LR range test.

Reference parity (find_best_lr.py:1-63): PTL `trainer.tuner.lr_find`
(exponential lr sweep, loss-vs-lr curve, steepest-gradient suggestion),
single-device only; saves args.json + plot.  Here the sweep runs the real
jitted train step with the lr injected per step.
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path

import numpy as np

from ..config import Config, parse_config
from ..data.multi_modal import MultiModalData
from ..train.engine import Trainer
from ..train.optim import set_learning_rate


def lr_find(cfg: Config, *, num_steps: int = 100, min_lr: float = 1e-8,
            max_lr: float = 1.0, early_stop_factor: float = 4.0) -> dict:
    data = MultiModalData(cfg)
    trainer = Trainer(cfg, workdir=cfg.default_root_dir)
    loader = data.train_dataloader()
    state = None
    lrs, losses = [], []
    best = math.inf
    step = 0
    while step < num_steps:
        loader.set_epoch(step)
        for batch in loader:
            if step >= num_steps:
                break
            lr = min_lr * (max_lr / min_lr) ** (step / max(1, num_steps - 1))
            if state is None:
                state = trainer.fresh_state(batch["image"][:1],
                                            np.asarray(batch.get("modality", [0]))[:1])
            state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
            state, loss = trainer.train_step(state, batch)
            loss = float(loss)
            lrs.append(lr)
            losses.append(loss)
            best = min(best, loss)
            step += 1
            if math.isnan(loss) or loss > early_stop_factor * best:
                step = num_steps
                break

    # steepest negative gradient of the smoothed curve (PTL suggestion)
    arr = np.asarray(losses)
    if len(arr) > 3:
        kernel = np.ones(3) / 3
        smooth = np.convolve(arr, kernel, mode="valid")
        grads = np.gradient(smooth)
        idx = int(np.argmin(grads)) + 1
    else:
        idx = int(np.argmin(arr))
    suggestion = lrs[min(idx, len(lrs) - 1)]
    return {"lr": suggestion, "lrs": lrs, "losses": losses}


def main(cfg: Config | None = None):
    cfg = cfg or parse_config()
    out_dir = Path(cfg.default_root_dir) / "lr_find"
    out_dir.mkdir(parents=True, exist_ok=True)
    result = lr_find(cfg, min_lr=cfg.min_lr, max_lr=cfg.max_lr)
    print(f"suggested lr: {result['lr']:.3e}")
    with open(out_dir / "args.json", "w") as f:
        json.dump({"suggested_lr": result["lr"], "model": cfg.model_name}, f)
    with open(out_dir / "curve.json", "w") as f:
        json.dump({"lrs": result["lrs"], "losses": result["losses"]}, f)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.semilogx(result["lrs"], result["losses"])
        plt.xlabel("lr")
        plt.ylabel("loss")
        plt.savefig(out_dir / "plot.pdf")
    except Exception:
        pass
    return result


if __name__ == "__main__":
    main()
