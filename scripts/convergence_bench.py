#!/usr/bin/env python
"""Accuracy-parity proxy benchmark: train the three conditional flagships
(C-UNet, C-UNETR, C-Swin-UNETR) on a synthetic MM-WHS-like set with the
README recipe semantics (dice_focal + warmup_cosine + interleaved CT/MR +
instance_cond norms — /root/reference README.md:170-204) and record
per-modality dice trajectories.

No real MM-WHS data exists in this environment (reference publishes no
numbers either, SURVEY §6), so this tracks a REPRODUCIBLE proxy: fixed-seed
synthetic volumes, fixed budget, dice trajectory per model per modality.
Output JSON is appended to CONVERGENCE.json and summarized for BASELINE.md.

Usage:
  python scripts/convergence_bench.py [--models unet,unetr,swin_unetr]
      [--epochs 12] [--volumes 8] [--shape 64] [--roi 32] [--out CONVERGENCE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


MODEL_CFGS = {
    # README recipe analogs scaled to the synthetic budget; every model is
    # CONDITIONAL (instance_cond) per the paper's headline configuration.
    "unet": dict(model_name="unet", feature_size=[8], num_layers=3,
                 strides=[2, 2], num_res_units=2,
                 encoder_norm_name="instance_cond",
                 decoder_norm_name="instance_cond"),
    "unetr": dict(model_name="unetr", feature_size=[8], hidden_size=128,
                  mlp_dim=256, num_heads=4,
                  vit_norm_name="instance_cond",
                  encoder_norm_name="instance_cond",
                  decoder_norm_name="instance"),
    "swin_unetr": dict(model_name="swin_unetr", feature_size=[12],
                       num_heads=2, depth_swin_block=[2],
                       vit_norm_name="instance_cond",
                       encoder_norm_name="instance_cond",
                       decoder_norm_name="instance"),
}


def run_model(name: str, root: Path, args) -> dict:
    import numpy as np

    from miseg_tpu.config import Config
    from miseg_tpu.data.multi_modal import MultiModalData
    from miseg_tpu.train.engine import Trainer

    roi = args.roi
    cfg = Config(out_channels=args.classes,
                 data_dirs=[str(root)] * 2, json_lists=["CT.json", "MR.json"],
                 roi_x=roi, roi_y=roi, roi_z=roi,
                 space_x=1.0, space_y=1.0, space_z=1.0,
                 batch_size=2, patches_training_sample=1,
                 criterion="dice_focal", scheduler="warmup_cosine",
                 warmup_epochs=2, lr=2e-3, optim_name="adamw",
                 max_epochs=args.epochs,
                 check_val_every_n_epoch=args.eval_every,
                 cache_num=64, num_workers=2, patience=10_000,
                 default_root_dir=str(root / "exp" / name),
                 **MODEL_CFGS[name])
    data = MultiModalData(cfg)
    trainer = Trainer(cfg, workdir=cfg.default_root_dir)

    history: list[dict] = []
    orig_eval = trainer.evaluate

    def record_eval(loader, state, **kw):
        m = orig_eval(loader, state, **kw)
        history.append({
            "epoch": kw.get("epoch"),
            "dice_avg": m["val/accuracy/avg"],
            "dice_ct": m.get("val/accuracy/modality_0"),
            "dice_mr": m.get("val/accuracy/modality_1"),
            "loss": m["val/loss/avg"],
        })
        print(f"[{name}] epoch {kw.get('epoch')}: dice={m['val/accuracy/avg']:.4f}"
              f" ct={m.get('val/accuracy/modality_0', float('nan')):.4f}"
              f" mr={m.get('val/accuracy/modality_1', float('nan')):.4f}",
              flush=True)
        return m

    trainer.evaluate = record_eval
    t0 = time.time()
    state = trainer.fit(data)
    wall = time.time() - t0
    final = history[-1] if history else {}
    return {"model": name, "epochs": args.epochs, "roi": roi,
            "volumes_per_modality": args.volumes, "wall_s": round(wall, 1),
            "history": history, "final": final}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="unet,unetr,swin_unetr")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--eval-every", type=int, default=3)
    p.add_argument("--volumes", type=int, default=8)
    p.add_argument("--val-volumes", type=int, default=2)
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--roi", type=int, default=32)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--root", default=None,
                   help="dataset dir (generated if missing); default temp")
    p.add_argument("--out", default="CONVERGENCE.json")
    args = p.parse_args()

    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    from miseg_tpu.data.synthetic import make_synthetic_dataset

    root = Path(args.root) if args.root else Path(tempfile.mkdtemp(
        prefix="miseg_convergence_"))
    if not (root / "CT.json").exists():
        make_synthetic_dataset(root, shape=(args.shape,) * 3,
                               num_classes=args.classes,
                               n_train=args.volumes, n_val=args.val_volumes,
                               n_test=1, seed=args.seed)
        print(f"# synthetic dataset at {root}", flush=True)

    results = []
    for name in args.models.split(","):
        results.append(run_model(name.strip(), root, args))

    import jax
    record = {"backend": jax.default_backend(),
              "recipe": "dice_focal+warmup_cosine+interleaved CT/MR+instance_cond",
              "results": results}
    out = Path(args.out)
    prev = json.loads(out.read_text()) if out.exists() else []
    prev.append(record)
    out.write_text(json.dumps(prev, indent=1))
    for r in results:
        f = r["final"]
        print(json.dumps({"model": r["model"], "dice_avg": f.get("dice_avg"),
                          "dice_ct": f.get("dice_ct"), "dice_mr": f.get("dice_mr"),
                          "wall_s": r["wall_s"]}))


if __name__ == "__main__":
    main()
