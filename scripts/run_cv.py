#!/usr/bin/env python
"""2-fold cross-validation runner for MM-WHS (the reference's protocol).

The reference runs CV by invoking train.py once per fold JSON
(CT_fold1/CT_fold2, each interleaved with MR — README.md:144-173); this
script orchestrates both folds, evaluates each best checkpoint, and
aggregates per-class/per-modality Dice across folds.

Usage:
  python scripts/run_cv.py --model_name swin_unetr --feature_size 48 ... \
      --data_dirs dataset/MM-WHS dataset/MM-WHS
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from miseg_tpu.config import parse_config
from miseg_tpu.cli.train import main as train_main


def main(cfg=None) -> dict:
    cfg = cfg or parse_config()
    fold_metrics = []
    for fold in (1, 2):
        fold_cfg = cfg.replace(
            json_lists=[f"CT_fold{fold}.json"] + list(cfg.json_lists[1:] or ["MR.json"]),
            experiment_name=f"{cfg.experiment_name or cfg.study_name}_fold{fold}")
        print(f"=== fold {fold}: {fold_cfg.json_lists} ===")
        train_main(fold_cfg)
        metrics_path = os.path.join(cfg.default_root_dir,
                                    fold_cfg.experiment_name, "metrics.jsonl")
        last = {}
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if "test/accuracy/avg" in rec:
                        last = rec
        fold_metrics.append(last)

    agg = {}
    keys = set().union(*[set(m) for m in fold_metrics if m])
    for k in sorted(keys):
        vals = [m[k] for m in fold_metrics if k in m and isinstance(m[k], (int, float))]
        if vals and (k.startswith("test/") or k.startswith("val_")):
            agg[f"cv/{k}"] = float(np.mean(vals))
    out_path = os.path.join(cfg.default_root_dir, "cv_summary.json")
    with open(out_path, "w") as f:
        json.dump({"folds": fold_metrics, "aggregate": agg}, f, indent=2)
    print(json.dumps(agg, indent=2))
    return agg


if __name__ == "__main__":
    main()
