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

_OFF = {"MISEG_PALLAS_NORM": "0", "MISEG_PALLAS_ATTN": "0",
        "MISEG_PALLAS_CONV": "0", "MISEG_PACKED_STATS": "0",
        "MISEG_BF16_SCORES": "0"}
VARIANTS = {
    "xla": _OFF,
    "norm": {**_OFF, "MISEG_PALLAS_NORM": "1"},
    "attn": {**_OFF, "MISEG_PALLAS_ATTN": "1"},
    "conv": {**_OFF, "MISEG_PALLAS_CONV": "1"},
    "conv+attn": {**_OFF, "MISEG_PALLAS_CONV": "1", "MISEG_PALLAS_ATTN": "1"},
    "both": {**_OFF, "MISEG_PALLAS_NORM": "1", "MISEG_PALLAS_ATTN": "1"},
    # round-4 layout experiment: instance-norm stats over a 128-lane-packed
    # flat view (ops/norms.py::_stats_packed) instead of the lane-minor C=48
    # reduce — kill bar < +5% e2e (VERDICT r3 #9)
    "packed": {**_OFF, "MISEG_PACKED_STATS": "1"},
    # round-5 precision experiment: bf16 materialized attention scores
    # (f32 MXU accumulation + f32 softmax internals kept) — halves the
    # largest forward tensor's HBM traffic (ops/dispatch.use_bf16_scores)
    "bf16_scores": {**_OFF, "MISEG_BF16_SCORES": "1"},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fs", type=int, default=48)
    p.add_argument("--roi", type=int, default=96)
    p.add_argument("--variants", default="xla,conv,attn,conv+attn")
    p.add_argument("--param-mode", default="closure",
                   choices=["closure", "arg"])
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
    os.environ.update(VARIANTS["xla"])  # shapes without pallas quirks
    dispatch.clear_cache()
    # timing only needs shapes: synthesize params in ONE jitted program
    # instead of running the real init (minutes on the tunneled backend)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)},
                           x.astype(jnp.float32), mods))

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
    reduce = jax.jit(lambda o: o.ravel()[0])

    n = args.iters
    print(f"{'variant':10s} {'ms/window':>10s} {'compile s':>10s}")
    for name in args.variants.split(","):
        os.environ.update(VARIANTS[name])
        dispatch.clear_cache()

        def body(p, a):
            y = model.apply({"params": p}, a, mods)        # [1,roi³,6]
            # feed output back as input: broadcast-reduce to 1 channel
            return jnp.broadcast_to(
                jnp.mean(y, axis=-1, keepdims=True).astype(jnp.bfloat16),
                a.shape)

        if args.param_mode == "closure":
            # bench.py semantics: the predictor closes over the weights, so
            # XLA pre-lays them out at compile time
            f = jax.jit(lambda a: jax.lax.fori_loop(
                0, n, lambda i, s: body(params, s), a))
            run = lambda a: f(a)
        else:
            # weights as jit arguments (the inferer's params-as-argument
            # path): per-call weight layout conversions are on the clock
            g = jax.jit(lambda p, a: jax.lax.fori_loop(
                0, n, lambda i, s: body(p, s), a))
            run = lambda a: g(params, a)
        t0 = time.perf_counter()
        np.asarray(reduce(run(x)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(reduce(run(x)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(reduce(run(run(run(x)))))
        t3 = time.perf_counter() - t0
        ms = (t3 - t1) / (2 * n) * 1e3
        print(f"{name:10s} {ms:10.2f} {tc:10.1f}", flush=True)


if __name__ == "__main__":
    main()
