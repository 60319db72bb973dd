#!/usr/bin/env python
"""Steady-state single-window forward time across kernel-dispatch variants.

Measures the flagship C-Swin-UNETR (fs=48, instance_cond) 96^3-window
forward with an IN-GRAPH fori_loop (one dispatch covers all iterations —
block_until_ready does not wait on the tunneled backend), for each
combination of the Pallas dispatch flags.  This is the fast inner loop for
kernel work; the full 64-window volume bench (bench.py) is the headline.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_forward.py \
      [--iters 20] [--fs 48] [--roi 96] [--variants xla,norm,attn,both]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = {
    "xla": {"MISEG_PALLAS_NORM": "0", "MISEG_PALLAS_ATTN": "0"},
    "norm": {"MISEG_PALLAS_NORM": "1", "MISEG_PALLAS_ATTN": "0"},
    "attn": {"MISEG_PALLAS_NORM": "0", "MISEG_PALLAS_ATTN": "1"},
    "both": {"MISEG_PALLAS_NORM": "1", "MISEG_PALLAS_ATTN": "1"},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--variants", default="xla,norm,attn,both")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.config import Config
    from miseg_tpu.models import model_from_config
    from miseg_tpu.ops import dispatch
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    cfg = Config(model_name="swin_unetr", out_channels=6,
                 feature_size=[args.fs], num_heads=3,
                 roi_x=args.roi, roi_y=args.roi, roi_z=args.roi,
                 encoder_norm_name="instance_cond",
                 vit_norm_name="instance_cond",
                 decoder_norm_name="instance")
    model = model_from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, args.roi, args.roi, args.roi, 1),
                               np.float32), jnp.bfloat16)
    mods = jnp.zeros((1,), jnp.int32)
    with jax.disable_jit(False):
        os.environ.update(VARIANTS["xla"])  # init without pallas quirks
        dispatch.clear_cache()
        variables = model.init({"params": jax.random.key(0)},
                               x.astype(jnp.float32), mods)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables["params"])
    reduce = jax.jit(lambda o: o.ravel()[0])

    n = args.iters
    print(f"{'variant':10s} {'ms/window':>10s} {'compile s':>10s}")
    for name in args.variants.split(","):
        os.environ.update(VARIANTS[name])
        dispatch.clear_cache()

        def body(a):
            y = model.apply({"params": params}, a, mods)   # [1,roi³,6]
            # feed output back as input: broadcast-reduce to 1 channel
            return jnp.broadcast_to(
                jnp.mean(y, axis=-1, keepdims=True).astype(jnp.bfloat16),
                a.shape)

        f = jax.jit(lambda a: jax.lax.fori_loop(0, n, lambda i, s: body(s), a))
        t0 = time.perf_counter()
        np.asarray(reduce(f(x)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(reduce(f(x)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(reduce(f(f(f(x)))))
        t3 = time.perf_counter() - t0
        ms = (t3 - t1) / (2 * n) * 1e3
        print(f"{name:10s} {ms:10.2f} {tc:10.1f}", flush=True)


if __name__ == "__main__":
    main()
