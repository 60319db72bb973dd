#!/usr/bin/env python
"""Conditional-normalization capability ablation (VERDICT round-2 #2).

MI-Seg's scientific claim: ONE shared network with per-modality
conditional instance-norm banks beats (a) the same network with plain
shared instance norms and (b) per-modality separate models, on mixed
CT/MR training (/root/reference README.md:89-101,
networks/norms/conditional_instance_norm.py:27-60).

This trains the conditional C-UNet three ways on bimodal synthetic data
with a REAL modality gap (MR contrast inverted + 3× noise,
`make_synthetic_dataset(mr_style="inverted")`) — same budget, same seed:

  1. `instance_cond`  — shared net, per-modality norm banks
  2. `instance`       — shared net, one shared norm
  3. `per_modality`   — two separate plain nets, one per modality
                        (each sees only its own modality's volumes, same
                        per-net epoch budget)

Records per-modality dice for each arm in ABLATION.json; summarized in
BASELINE.md.  Gated by tests/test_ablation_slow.py at a smaller budget.

Usage: PYTHONPATH=/root/repo python scripts/ablation_cond_norm.py
       [--epochs 16] [--volumes 8] [--shape 64] [--roi 32] [--out ABLATION.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def base_config(root: Path, args, workdir: str, norm: str,
                json_lists: list[str]) -> "Config":
    from miseg_tpu.config import Config
    roi = args.roi
    return Config(model_name="unet", feature_size=[8], num_layers=3,
                  strides=[2, 2], num_res_units=2,
                  encoder_norm_name=norm, decoder_norm_name=norm,
                  out_channels=args.classes,
                  data_dirs=[str(root)] * len(json_lists),
                  json_lists=json_lists,
                  roi_x=roi, roi_y=roi, roi_z=roi,
                  space_x=1.0, space_y=1.0, space_z=1.0,
                  batch_size=2, patches_training_sample=1,
                  criterion="dice_focal", scheduler="warmup_cosine",
                  warmup_epochs=2, lr=2e-3, optim_name="adamw",
                  max_epochs=args.epochs,
                  check_val_every_n_epoch=args.epochs,  # eval at end only
                  cache_num=64, num_workers=0, patience=10_000,
                  seed=args.seed, default_root_dir=workdir)


def train_eval(cfg) -> dict:
    from miseg_tpu.data.multi_modal import MultiModalData
    from miseg_tpu.train.engine import Trainer
    data = MultiModalData(cfg)
    trainer = Trainer(cfg, workdir=cfg.default_root_dir)
    state = trainer.fit(data)
    m = trainer.evaluate(data.val_dataloader(), state)
    detail = {k: round(float(v), 4) for k, v in m.items()
              if "_dice/class" in k}  # per-modality per-class signature
    return {"dice_avg": m["val/accuracy/avg"],
            "dice_ct": m.get("val/accuracy/modality_0"),
            "dice_mr": m.get("val/accuracy/modality_1"),
            "detail": detail}


def run(root: Path, args) -> dict:
    t0 = time.time()
    out: dict = {"budget_epochs": args.epochs, "roi": args.roi,
                 "volumes_per_modality": args.volumes, "seed": args.seed,
                 "gap": args.gap}

    print("== arm 1: instance_cond (shared net, per-modality banks)",
          flush=True)
    cfg = base_config(root, args, str(root / "exp_cond"), "instance_cond",
                      ["CT.json", "MR.json"])
    out["instance_cond"] = train_eval(cfg)
    print(out["instance_cond"], flush=True)

    print("== arm 2: instance (shared net, shared norm)", flush=True)
    cfg = base_config(root, args, str(root / "exp_plain"), "instance",
                      ["CT.json", "MR.json"])
    out["instance"] = train_eval(cfg)
    print(out["instance"], flush=True)

    print("== arm 3: per-modality separate plain nets", flush=True)
    per = {}
    for name, key in (("CT", "dice_ct"), ("MR", "dice_mr")):
        cfg = base_config(root, args, str(root / f"exp_sep_{name}"),
                          "instance", [f"{name}.json"])
        m = train_eval(cfg)
        per[key] = m["dice_avg"]
        per[f"detail_{name.lower()}"] = m["detail"]
        print(f"  {name}: {m['dice_avg']:.4f}", flush=True)
    per["dice_avg"] = (per["dice_ct"] + per["dice_mr"]) / 2
    out["per_modality"] = per

    out["wall_s"] = round(time.time() - t0, 1)
    out["delta_cond_vs_plain"] = round(
        out["instance_cond"]["dice_avg"] - out["instance"]["dice_avg"], 4)
    out["delta_cond_vs_separate"] = round(
        out["instance_cond"]["dice_avg"] - out["per_modality"]["dice_avg"], 4)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--volumes", type=int, default=8)
    p.add_argument("--val-volumes", type=int, default=3)
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--roi", type=int, default=32)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gap", default="derangement",
                   choices=["inverted", "classswap", "derangement"],
                   help="modality gap style (classswap: same appearance "
                        "means different classes per modality — round-3 "
                        "measured 'inverted' alone is absorbable by shared "
                        "convs)")
    p.add_argument("--out", default="ABLATION.json")
    args = p.parse_args()

    from miseg_tpu.data.synthetic import make_synthetic_dataset
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    root = Path(tempfile.mkdtemp(prefix="miseg_ablation_"))
    make_synthetic_dataset(root, shape=(args.shape,) * 3,
                           num_classes=args.classes, n_train=args.volumes,
                           n_val=args.val_volumes, n_test=1, seed=args.seed,
                           mr_style=args.gap)
    print(f"# dataset at {root}", flush=True)

    record = run(root, args)
    out = Path(args.out)
    prev = json.loads(out.read_text()) if out.exists() else []
    prev.append(record)
    out.write_text(json.dumps(prev, indent=1))
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
