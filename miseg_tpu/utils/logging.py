"""Metric logging: console + JSONL + optional wandb.

The reference is wandb-centric (WandbLogger train.py:17-25, raw
`wandb.init` keyed `study_name_trialN` tune.py:92-101, offline-sync
utility utils/sync_wandb.py).  wandb is optional here: when importable it
receives every log call; the always-on sink is a JSONL file (one
`{"step": n, **metrics}` line per call) plus console prints — the
TPU-cluster analog of offline wandb.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, directory: str | Path | None = None,
                 wandb_kwargs: dict | None = None, quiet: bool = False):
        self.quiet = quiet
        self._fh = None
        if directory is not None:
            d = Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            self._fh = open(d / "metrics.jsonl", "a")
        self._wandb = None
        if wandb_kwargs is not None:
            try:
                import wandb
                self._wandb = wandb.init(**wandb_kwargs)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: int | None = None) -> None:
        rec = {"ts": time.time(), **({"step": step} if step is not None else {}),
               **{k: float(v) for k, v in metrics.items()}}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if not self.quiet:
            head = f"[step {step}] " if step is not None else ""
            body = " ".join(f"{k}={v:.5g}" for k, v in metrics.items()
                            if isinstance(v, (int, float)))
            print(head + body, file=sys.stderr)

    def finish(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
