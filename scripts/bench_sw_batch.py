#!/usr/bin/env python
"""sw_batch_size sweep on the real sliding-window path (VERDICT round-1 #3).

Round-1 measured bs=2/4 ≈ 2.3x slower per window than bs=1 and hypothesized
swin layout blowup on the fused window-batch dim.  This measures each batch
size with the trustworthy fetch-sync protocol and, with --profile, dumps the
per-op table for bs=1 vs bs=4 so the responsible HLO op can be named.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sw_batch.py [--sizes 1,2,4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--batch-windows", action="store_true",
                   help="TRUE window batching (round-2: 2.2x slower under "
                        "XLA, norm-stats fusion failure at batch>=2)")
    p.add_argument("--pallas-norm", action="store_true",
                   help="supply full-res norms from the Pallas fused_norm "
                        "kernel (VERDICT r2 #3: the one regime where it "
                        "isn't handicapped by XLA cross-op fusion)")
    args = p.parse_args()

    import os
    if args.pallas_norm:
        os.environ["MISEG_PALLAS_NORM"] = "1"
        from miseg_tpu.ops import dispatch
        dispatch.clear_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.inferers import (SlidingWindowInferer, dense_patch_starts,
                                    scan_interval)
    from miseg_tpu.models import model_from_config
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    roi = (96, 96, 96)
    vol = (224, 224, 224)
    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=roi[0], roi_y=roi[1], roi_z=roi[2],
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, *roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x0, mods)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables["params"])

    def predict(w, m):
        return model.apply({"params": params}, w.astype(jnp.bfloat16),
                           m).astype(jnp.float32)

    volume = jnp.asarray(rng.random((1, *vol, 1), np.float32))
    modality = jnp.zeros((1,), jnp.int32)
    n_windows = len(dense_patch_starts(vol, roi, scan_interval(roi, 0.5)))
    fetch = jax.jit(lambda o: o.ravel()[0])

    print(f"{'sw_bs':>6s} {'s/volume':>9s} {'patches/s':>10s} {'compile s':>10s}")
    for bs in [int(s) for s in args.sizes.split(",")]:
        inferer = SlidingWindowInferer(predict, roi_size=roi, sw_batch_size=bs,
                                       overlap=0.5, mode="gaussian",
                                       out_channels=6,
                                       batch_windows=args.batch_windows)

        def run_n(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = inferer(volume, modality)
            np.asarray(fetch(out))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        run_n(1)
        tc = time.perf_counter() - t0
        t1, t2 = run_n(2), run_n(2 + args.reps)
        dt = (t2 - t1) / args.reps
        print(f"{bs:6d} {dt:9.2f} {n_windows / dt:10.2f} {tc:10.1f}",
              flush=True)


if __name__ == "__main__":
    main()
