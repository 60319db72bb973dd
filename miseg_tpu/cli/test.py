"""`test.py` — checkpoint evaluation (NOT a unit test; the reference's
root-level test.py is a model evaluation script, test.py:126-172).

Flow: load checkpoint → model → test loader → sliding-window eval →
overall + per-modality Dice and symmetric euclidean SurfaceDistance with
per-class breakdown (test.py:43-123).
"""

from __future__ import annotations

import numpy as np

from ..config import Config, parse_config
from ..data.multi_modal import get_loaders
from ..train.checkpoint import load_any_checkpoint_params
from ..train.engine import Trainer


def main(cfg: Config | None = None) -> dict:
    cfg = cfg or parse_config()
    if not cfg.ckpt_path and not cfg.pretrained:
        raise ValueError("provide --ckpt_path (or --pretrained) to evaluate")
    trainer = Trainer(cfg, workdir=cfg.default_root_dir)
    sample = np.zeros((1, *cfg.roi, cfg.in_channels), np.float32)
    state = trainer.init_state(sample, np.zeros((1,), np.int32))
    # accepts our msgpack checkpoints AND reference torch .pt/.ckpt
    params = load_any_checkpoint_params(cfg.ckpt_path or cfg.pretrained,
                                        state.params)
    state = state.replace(params=params)
    loader = get_loaders(cfg, test_mode=True)
    metrics = trainer.evaluate(loader, state, prefix="test",
                               compute_surface=True)
    for k in sorted(metrics):
        print(f"{k}: {metrics[k]:.4f}")
    return metrics


if __name__ == "__main__":
    main()
