#!/usr/bin/env python
"""Micro-benchmark: instance-norm(+act+add) — XLA jnp path vs fused Pallas.

Hot shapes from the C-Swin-UNETR (fs=48) profile: the full-resolution norm
fusions are the top ops (XLA runs them ~20x off the HBM roofline).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_norm.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    ("96^3 x48 (full-res)", (1, 96, 96, 96, 48)),
    ("48^3 x96 (L1)", (1, 48, 48, 48, 96)),
    ("48^3 x48 (swin s1)", (1, 48, 48, 48, 48)),
    ("24^3 x192 (L2)", (1, 24, 24, 24, 192)),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.ops.norms import conditional_instance_norm
    from miseg_tpu.ops.pallas import fused_instance_norm_act
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    reduce = jax.jit(lambda o: o.ravel()[0])
    print(f"{'case':24s} {'xla ms':>9s} {'pallas ms':>10s} {'speedup':>8s} {'roofline ms':>12s}")
    for name, shape in SHAPES:
        c = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        styles = jnp.zeros((shape[0],), jnp.int32)
        gamma = jnp.asarray(rng.standard_normal((2, c)) + 1.0, jnp.float32)
        beta = jnp.asarray(rng.standard_normal((2, c)), jnp.float32)

        def body_x(x):
            return jax.nn.leaky_relu(
                conditional_instance_norm(x, styles, gamma, beta), 0.01)

        def body_p(x):
            return fused_instance_norm_act(x, gamma, beta, styles,
                                           negative_slope=0.01)

        def timeit(body):
            # loop IN-GRAPH: one dispatch covers `iters` iterations, so the
            # tunnel round trip is amortized away entirely
            n = args.iters
            f = jax.jit(lambda x: jax.lax.fori_loop(
                0, n, lambda i, a: body(a), x))
            np.asarray(reduce(f(x)))  # compile+warm
            t0 = time.perf_counter()
            np.asarray(reduce(f(x)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(reduce(reduce_chain(f, x, 3)))
            t3 = time.perf_counter() - t0
            return (t3 - t1) / (2 * n) * 1e3

        def reduce_chain(f, x, k):
            out = x
            for _ in range(k):
                out = f(out)
            return out

        tx, tp = timeit(body_x), timeit(body_p)
        nbytes = int(np.prod(shape)) * 2
        roof = 3 * nbytes / 819e9 * 1e3  # 2 reads + 1 write at v5e peak BW
        print(f"{name:24s} {tx:9.3f} {tp:10.3f} {tx / tp:8.2f} {roof:12.3f}")


if __name__ == "__main__":
    main()
