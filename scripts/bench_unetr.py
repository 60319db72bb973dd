#!/usr/bin/env python
"""Honest-protocol benchmark for the non-swin conditional flagships:
C-UNETR (fs=16, hidden 768, instance_cond ViT+encoder) and C-UNet-vanilla
(the README prediction recipe) — sliding-window patches/s + train step.

Round-1 recorded C-UNETR with the broken block_until_ready sync; this
re-measures with fetch-sync (BASELINE.md round-2 protocol).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_unetr.py [--models unetr,unet_vanilla]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(name: str):
    from miseg_tpu.config import Config
    if name == "unetr":
        return Config(model_name="unetr", out_channels=6, feature_size=[16],
                      hidden_size=768, mlp_dim=3072, num_heads=12,
                      roi_x=96, roi_y=96, roi_z=96,
                      encoder_norm_name="instance_cond",
                      vit_norm_name="instance_cond",
                      decoder_norm_name="instance")
    if name == "unet_vanilla":
        # README.md:222-232 prediction recipe
        return Config(model_name="unet_vanilla", out_channels=8,
                      feature_size=[16, 64, 128, 256, 512], num_res_units=3,
                      strides=[1, 2, 2, 2, 1],
                      roi_x=96, roi_y=96, roi_z=96,
                      encoder_norm_name="instance_cond",
                      decoder_norm_name="instance")
    raise ValueError(name)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="unetr,unet_vanilla")
    p.add_argument("--reps", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from miseg_tpu.inferers import (SlidingWindowInferer, dense_patch_starts,
                                    scan_interval)
    from miseg_tpu.losses import loss_from_config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    roi = (96, 96, 96)
    vol = (224, 224, 224)
    fetch = jax.jit(lambda o: o.ravel()[0])
    for name in args.models.split(","):
        cfg = build(name)
        model = model_from_config(cfg)
        x0 = jnp.asarray(rng.random((1, *roi, 1), np.float32))
        mods = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": jax.random.key(0)}, x0, mods)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables["params"])

        def predict(w, m):
            return model.apply({"params": params}, w.astype(jnp.bfloat16),
                               m).astype(jnp.float32)

        inferer = SlidingWindowInferer(predict, roi_size=roi, sw_batch_size=1,
                                       overlap=0.5, mode="gaussian",
                                       out_channels=cfg.out_channels)
        volume = jnp.asarray(rng.random((1, *vol, 1), np.float32))
        n_win = len(dense_patch_starts(vol, roi, scan_interval(roi, 0.5)))

        def run_n(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = inferer(volume, mods)
            np.asarray(fetch(out))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        run_n(1)
        tc = time.perf_counter() - t0
        t1, t2 = run_n(2), run_n(2 + args.reps)
        dt = (t2 - t1) / args.reps

        # train step
        loss_fn = loss_from_config(cfg.replace(criterion="dice_focal"))
        tx = optax.adamw(1e-4)
        pf32 = variables["params"]
        opt = tx.init(pf32)
        label = jnp.asarray(rng.integers(0, cfg.out_channels, (1, *roi)),
                            jnp.int32)

        @jax.jit
        def step(p, o, image, lab, m):
            def loss_of(pp):
                pc = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                  if a.dtype == jnp.float32 else a, pp)
                logits = model.apply({"params": pc},
                                     image.astype(jnp.bfloat16), m,
                                     train=True).astype(jnp.float32)
                return loss_fn(logits, lab)
            loss, grads = jax.value_and_grad(loss_of)(p)
            up, o = tx.update(grads, o, p)
            return optax.apply_updates(p, up), o, loss

        def steps_n(n):
            nonlocal pf32, opt
            t0 = time.perf_counter()
            loss = None
            for _ in range(n):
                pf32, opt, loss = step(pf32, opt, x0, label, mods)
            np.asarray(loss)
            return time.perf_counter() - t0

        steps_n(1)
        t1s, t2s = steps_n(2), steps_n(2 + args.reps)
        tr = (t2s - t1s) / args.reps * 1e3
        print(f"{name:14s} sliding-window {n_win / dt:7.2f} patches/s "
              f"({dt:.2f} s/volume, compile {tc:.0f}s); "
              f"train {tr:6.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
