#!/usr/bin/env python
"""Same-session A/B of the HEADLINE sliding-window program over dispatch
flags (default: MISEG_BF16_SCORES 0 vs 1).

bench.py's absolute patches/s moves with tunneled-backend drift between
sessions (observed: identical back-to-back runs compile the same cached
programs in 129s vs 522s), so a flag's e2e verdict must come from ONE
process with the arms interleaved A B A B — each arm measured twice so
drift shows up as disagreement between its own two slopes.

Protocol per arm = bench.py's: full SlidingWindowInferer (gaussian,
overlap 0.5) over a 224^3 volume, in-order program enqueue, host-fetch
sync, two-batch slope.  Params are synthesized in one jitted program
(timing needs shapes, not trained weights).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sw_ab.py \
      [--flag MISEG_BF16_SCORES] [--reps 6] [--fs 48] [--roi 96] [--vol 224]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--flag", default="MISEG_BF16_SCORES")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--vol", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from miseg_tpu.config import Config
    from miseg_tpu.inferers import (SlidingWindowInferer, dense_patch_starts,
                                    scan_interval)
    from miseg_tpu.models import model_from_config
    from miseg_tpu.ops import dispatch
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    roi, vol = (args.roi,) * 3, (args.vol,) * 3
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
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, x0, mods))

    @jax.jit
    def make_params(key):
        leaves, treedef = jax.tree.flatten(shapes["params"])
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(treedef, [
            0.05 * jax.random.normal(k, a.shape,
                                     jnp.bfloat16 if a.dtype == jnp.float32
                                     else a.dtype)
            for k, a in zip(keys, leaves)])

    params = make_params(jax.random.key(0))
    volume = jnp.asarray(rng.random((1, *vol, 1), np.float32))
    modality = jnp.zeros((1,), jnp.int32)
    n_windows = len(dense_patch_starts(vol, roi, scan_interval(roi, 0.5)))
    fetch = jax.jit(lambda o: o.ravel()[0])

    def build(val):
        os.environ[args.flag] = val
        dispatch.clear_cache()

        def predict(w, m):
            return model.apply({"params": params},
                               w.astype(jnp.bfloat16), m).astype(jnp.float32)

        return SlidingWindowInferer(predict, roi_size=roi, sw_batch_size=1,
                                    overlap=0.5, mode="gaussian",
                                    out_channels=6)

    def measure(inferer):
        def run_volumes(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = inferer(volume, modality)
            np.asarray(fetch(out))
            return time.perf_counter() - t0

        tc0 = time.perf_counter()
        run_volumes(1)
        tc = time.perf_counter() - tc0
        t1, t2 = run_volumes(2), run_volumes(2 + args.reps)
        return n_windows / ((t2 - t1) / args.reps), tc

    arms = {"0": build("0"), "1": build("1")}
    results = {"0": [], "1": []}
    for round_i in range(2):
        for val in ("0", "1"):
            os.environ[args.flag] = val
            dispatch.clear_cache()
            pps, tc = measure(arms[val])
            results[val].append(pps)
            print(f"{args.flag}={val} pass {round_i}: {pps:.2f} patches/s "
                  f"(first-call {tc:.1f}s)", flush=True)
    import json
    mean = {k: sum(v) / len(v) for k, v in results.items()}
    print(json.dumps(dict(flag=args.flag, off=results["0"], on=results["1"],
                          mean_off=round(mean["0"], 2),
                          mean_on=round(mean["1"], 2),
                          on_vs_off=round(mean["1"] / mean["0"], 4))))


if __name__ == "__main__":
    main()
