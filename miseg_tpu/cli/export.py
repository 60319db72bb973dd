"""`export` — AOT-compile a trained model into a serving bundle.

No reference analog: the reference deploys by running predict_whs.py
inside the full torch/MONAI stack (predict_whs.py:35-114).  Here the
deployable unit is a versioned StableHLO artifact (serve.py): lowered
once — for every target platform at once, from any host — and served
without model code.

    python -m miseg_tpu.cli.export --model_name=swin_unetr ... \
        --ckpt_path experiments/.../best.ckpt \
        --export_dir bundles/cswin_fs48 --export_platforms tpu cpu \
        --export_check
"""

from __future__ import annotations

import jax
import numpy as np

from ..config import Config, parse_config
from ..models import model_from_config
from ..serve import export_bundle, load_bundle
from ..train.checkpoint import load_any_checkpoint_params


def main(cfg: Config | None = None) -> str:
    cfg = cfg or parse_config()
    if not (cfg.ckpt_path or cfg.pretrained):
        raise ValueError("provide --ckpt_path (or --pretrained) to export")

    model = model_from_config(cfg)
    sample = np.zeros((1, *cfg.roi, cfg.in_channels), np.float32)
    variables = model.init({"params": jax.random.key(cfg.seed)},
                           sample, np.zeros((1,), np.int32))
    params = load_any_checkpoint_params(cfg.ckpt_path or cfg.pretrained,
                                        variables["params"])

    vol_shapes = []
    for s in cfg.export_volume_shapes:
        parts = s.lower().split("x")
        if len(parts) != len(cfg.roi) or not all(
                p.isdigit() and int(p) > 0 for p in parts):
            raise ValueError(
                f"--export_volume_shapes entry {s!r} must be "
                f"{len(cfg.roi)} positive integers joined by 'x' "
                f"(e.g. {'x'.join(['224'] * len(cfg.roi))})")
        vol_shapes.append(tuple(int(p) for p in parts))
    out = export_bundle(cfg, params, cfg.export_dir,
                        platforms=tuple(cfg.export_platforms),
                        volume_shapes=vol_shapes,
                        bake_params=cfg.export_bake_params)
    print(f"exported {cfg.model_name} -> {out} "
          f"(platforms={list(cfg.export_platforms)}, roi={list(cfg.roi)}"
          + (f", volume programs={vol_shapes}" if vol_shapes else "") + ")")

    if cfg.export_check:
        served = load_bundle(out)
        window = np.random.default_rng(0).normal(
            size=(served.meta["sw_batch_size"], *cfg.roi,
                  cfg.in_channels)).astype(np.float32)
        mods = np.zeros((served.meta["sw_batch_size"],), np.int32)
        got = np.asarray(served(window, mods))
        want = np.asarray(model.apply({"params": params},
                                      window, mods, train=False))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        print(f"export check ok: bundle forward matches live model "
              f"(max abs diff {np.abs(got - want).max():.2e})")
    return str(out)


if __name__ == "__main__":
    main()
