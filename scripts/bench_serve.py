#!/usr/bin/env python
"""Serving-bundle throughput: the AOT StableHLO artifact vs the live model.

The deployment story (serve.py) claims the exported program is the same
compiled compute as the live model — this measures it.  Protocol matches
bench.py: flagship C-Swin-UNETR (fs=48, instance_cond), 224³ volume,
96³ ROI, 0.5 overlap, gaussian blending, fetch-synced two-batch slopes
(block_until_ready does not wait on the tunneled backend).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serve.py \
      [--fs 48] [--roi 96] [--vol 224] [--reps 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--vol", type=int, default=224)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--no_baked", action="store_true",
                   help="skip the baked-params volume arm (halves export time)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.inferers import (SlidingWindowInferer, dense_patch_starts,
                                    scan_interval)
    from miseg_tpu.models import model_from_config
    from miseg_tpu.serve import export_bundle, load_bundle
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    roi = (args.roi,) * 3
    vol_shape = (args.vol,) * 3
    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=args.roi, roi_y=args.roi, roi_z=args.roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, *roi, 1), np.float32))
    mods = jnp.zeros((1,), jnp.int32)
    variables = model.init({"params": jax.random.key(0)}, x0, mods)
    params = variables["params"]

    print("# exporting bundle ...", file=sys.stderr, flush=True)
    # tpu-only lowering: cpu would double the (minutes-long) host
    # tracing+lowering work for an artifact this bench never runs on cpu
    bundle_dir = export_bundle(cfg, params, tempfile.mkdtemp() + "/bundle",
                               platforms=("tpu",),
                               volume_shapes=[vol_shape])
    served = load_bundle(bundle_dir)
    assert served._volume_program(vol_shape, 1, cfg.infer_overlap,
                                  "gaussian") is not None

    # live side: same bf16 policy the bundle bakes in
    bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def live_predict(w, m):
        return model.apply({"params": bf16}, w.astype(jnp.bfloat16),
                           m).astype(jnp.float32)

    live = SlidingWindowInferer(live_predict, roi_size=roi,
                                sw_batch_size=1, overlap=cfg.infer_overlap,
                                mode="gaussian", out_channels=6)
    volume = jnp.asarray(rng.random((1, *vol_shape, 1), np.float32))
    modality = jnp.zeros((1,), jnp.int32)
    n_windows = len(dense_patch_starts(
        vol_shape, roi, scan_interval(roi, cfg.infer_overlap)))
    fetch = jax.jit(lambda o: o.ravel()[0])

    def measure(fn, label):
        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            np.asarray(fetch(out))
            return time.perf_counter() - t0

        t_c = time.perf_counter()
        run(1)
        print(f"# {label} compile+warm {time.perf_counter() - t_c:.1f}s",
              file=sys.stderr, flush=True)
        t1, t2 = run(2), run(2 + args.reps)
        dt = (t2 - t1) / args.reps
        return n_windows / dt

    live_pps = measure(lambda: live(volume, modality), "live")
    # control arm: the SAME live model through the SAME params-as-argument
    # inferer path the bundle arms use — isolates the jax.export
    # import-boundary cost from the calling-convention cost
    live_arg = SlidingWindowInferer(
        lambda pv, w, m: model.apply({"params": pv},
                                     w.astype(jnp.bfloat16),
                                     m).astype(jnp.float32),
        roi_size=roi, sw_batch_size=1, overlap=cfg.infer_overlap,
        mode="gaussian", out_channels=6)
    live_arg_pps = measure(lambda: live_arg(volume, modality, bf16),
                           "live(params-as-arg)")
    # window arm: same bundle with the volume programs masked out — the
    # imported window module re-traced inside the generic inferer
    served_win = load_bundle(bundle_dir)
    served_win.meta = dict(served_win.meta, volume_programs=[])
    win_pps = measure(lambda: served_win.predict(volume, modality,
                                                 mode="gaussian"),
                      "bundle(window-level)")
    vol_pps = measure(lambda: served.predict(volume, modality,
                                             mode="gaussian"),
                      "bundle(volume-level)")
    baked_pps = baked_diff = None
    if not args.no_baked:
        # baked arm: weights as module CONSTANTS — the calling convention
        # the live model compiles under (the params-as-arg control arm
        # isolates this as the whole 0.83x steady-state gap)
        print("# exporting baked bundle ...", file=sys.stderr, flush=True)
        baked_dir = export_bundle(cfg, params, tempfile.mkdtemp() + "/baked",
                                  platforms=("tpu",),
                                  volume_shapes=[vol_shape], bake_params=True)
        baked = load_bundle(baked_dir)
        baked_pps = measure(lambda: baked.predict(volume, modality,
                                                  mode="gaussian"),
                            "bundle(volume-level, baked)")
        a_baked = np.asarray(baked.predict(volume, modality, mode="gaussian"))
    # spot-check BOTH served arms against the live output (bundle and
    # live share the bf16 policy) — each timed path is parity-certified
    a = np.asarray(served.predict(volume, modality, mode="gaussian"))
    a_win = np.asarray(served_win.predict(volume, modality, mode="gaussian"))
    b = np.asarray(live(volume, modality))
    max_diff = float(np.abs(a - b).max())
    max_diff_win = float(np.abs(a_win - b).max())
    if baked_pps is not None:
        baked_diff = float(np.abs(a_baked - b).max())

    out = {
        "live_patches_per_sec": round(live_pps, 2),
        "live_arg_patches_per_sec": round(live_arg_pps, 2),
        "bundle_window_patches_per_sec": round(win_pps, 2),
        "bundle_volume_patches_per_sec": round(vol_pps, 2),
        "bundle_window_vs_live": round(win_pps / live_pps, 3),
        "bundle_volume_vs_live": round(vol_pps / live_pps, 3),
        "max_abs_diff": max_diff,
        "max_abs_diff_window_arm": max_diff_win,
        "n_windows": n_windows,
    }
    if baked_pps is not None:
        out["bundle_volume_baked_patches_per_sec"] = round(baked_pps, 2)
        out["bundle_volume_baked_vs_live"] = round(baked_pps / live_pps, 3)
        out["max_abs_diff_baked_arm"] = baked_diff
    print(json.dumps(out))


if __name__ == "__main__":
    main()
