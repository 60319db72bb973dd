#!/usr/bin/env python
"""Micro-benchmark: fused conv3+affine+stats Pallas kernel vs the XLA chain.

Per iteration both variants compute the SAME function: per-channel affine +
leaky on the input, 3^3 same-pad conv, per-channel (sum, sum-sq) of the
output, then fold stats into the next affine columns (as the dynunet
UnetResBlock chain does).  Chained in-graph so layouts are XLA's choice.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv.py [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    ("96^3 48->48", (1, 96, 96, 96, 48), 48),
    ("96^3 96->48", (1, 96, 96, 96, 96), 48),
    ("48^3 96->96", (1, 48, 48, 48, 96), 96),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from miseg_tpu.ops.pallas.fused_conv import conv3_norm_stats, norm_columns
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    reduce = jax.jit(lambda o: o.ravel()[0])
    print(f"{'case':16s} {'xla ms':>9s} {'pallas ms':>10s} {'speedup':>8s}")
    for name, shape, cout in SHAPES:
        cin = shape[-1]
        n = int(np.prod(shape[1:-1]))
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, 3, cout, cin)) * 0.05,
                         jnp.bfloat16)  # back to cin so the loop chains
        gamma = jnp.asarray(rng.standard_normal((2, cout)) + 1.0, jnp.float32)
        beta = jnp.asarray(rng.standard_normal((2, cout)), jnp.float32)
        styles = jnp.zeros((1,), jnp.int32)
        sc0 = jnp.ones((1, cin), jnp.float32)
        sh0 = jnp.zeros((1, cin), jnp.float32)

        def xla_step(a, wgt, sc, sh, co):
            t = a.astype(jnp.float32) * sc[:, None, None, None, :] \
                + sh[:, None, None, None, :]
            t = jnp.where(t >= 0, t, 0.01 * t).astype(a.dtype)
            y = lax.conv_general_dilated(
                t, wgt, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            s0 = jnp.sum(y, axis=(1, 2, 3))
            s1 = jnp.sum(y * y, axis=(1, 2, 3))
            return y.astype(a.dtype), jnp.stack([s0, s1], 1)

        def body(a, step):
            y, s = step(a, w, sc0, sh0, cout)
            sc, sh = norm_columns(s, n, gamma, beta, styles)
            y2, s2 = step(y, wb, sc, sh, cin)
            sc2, sh2 = norm_columns(s2, n, None, None, None)
            return (y2.astype(jnp.float32) * sc2[:, None, None, None, :]
                    + sh2[:, None, None, None, :]).astype(a.dtype)

        def pallas_step(a, wgt, sc, sh, co):
            return conv3_norm_stats(a, wgt, sc, sh, slope=0.01)

        def timeit(step):
            nit = args.iters
            f = jax.jit(lambda a: lax.fori_loop(
                0, nit, lambda i, s: body(s, step), a))
            np.asarray(reduce(f(x)))
            t0 = time.perf_counter()
            np.asarray(reduce(f(x)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(reduce(f(f(f(x)))))
            t3 = time.perf_counter() - t0
            return (t3 - t1) / (2 * nit) * 1e3 / 2  # 2 convs per body

        tx = timeit(xla_step)
        tp = timeit(pallas_step)
        print(f"{name:16s} {tx:9.3f} {tp:10.3f} {tx / tp:8.2f}", flush=True)


if __name__ == "__main__":
    main()
