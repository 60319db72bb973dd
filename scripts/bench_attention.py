#!/usr/bin/env python
"""Micro-benchmark: windowed attention — XLA einsum path vs Pallas kernel.

Shapes are the real C-Swin-UNETR (fs=48, 96^3 window) stage shapes:
  stage 1: BW=343, N=343, C=48,  H=3   (padded 49^3 token grid, 7^3 windows)
  stage 2: BW=64,  N=343, C=96,  H=6
  stage 3: BW=8,   N=343, C=192, H=12
  stage 4: BW=1,   N=343, C=384, H=24

Each stage runs twice per forward (one unshifted, one shifted/masked), and
the 96^3 sliding-window volume runs 64 windows per call — so per-window ms
here multiply straight into the headline bench.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STAGES = [
    ("stage1", 343, 343, 48, 3),
    ("stage2", 64, 343, 96, 6),
    ("stage3", 8, 343, 192, 12),
    ("stage4", 1, 343, 384, 24),
]


def xla_attention(q, k, v, bias, ids, num_heads):
    """The in-model XLA path (nn/swin.py): ids-based fused mask compare."""
    import jax
    import jax.numpy as jnp
    bw, n, c = q.shape
    hd = c // num_heads
    qh = q.reshape(bw, n, num_heads, hd)
    kh = k.reshape(bw, n, num_heads, hd)
    vh = v.reshape(bw, n, num_heads, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = attn + bias.astype(attn.dtype)[None]
    if ids is not None:
        nw = ids.shape[0]
        attn = attn.reshape(bw // nw, nw, num_heads, n, n)
        neq = ids[:, None, :] != ids[:, :, None]
        attn = jnp.where(neq[None, :, None], attn - 100.0, attn)
        attn = attn.reshape(bw, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(vh.dtype), vh) \
        .reshape(bw, n, c)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--masked", action="store_true", default=False)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from miseg_tpu.ops.pallas import fused_window_attention
    from miseg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    print(f"{'case':26s} {'xla ms':>9s} {'pallas ms':>10s} {'speedup':>8s}")
    for name, bw, n, c, h in STAGES:
        for masked in (False, True):
            q, k, v = (jnp.asarray(rng.standard_normal((bw, n, c)),
                                   jnp.bfloat16) for _ in range(3))
            bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32)
            mask = None
            if masked:
                # region ids [nW, N]; nW = bw (worst case, B=1 in-model)
                mask = jnp.asarray(rng.integers(0, 8, (bw, n)), jnp.int32)

            fx = lambda q, k, v, b, m: xla_attention(q, k, v, b, m, h)
            fp = lambda q, k, v, b, m: fused_window_attention(
                q, k, v, b, m, num_heads=h)

            reduce = jax.jit(lambda o: o.ravel()[0])

            def timeit(body):
                # loop IN-GRAPH (one dispatch covers all iterations — the
                # tunneled backend's block_until_ready does not wait, and
                # per-dispatch round trips would otherwise dominate)
                n = args.iters
                f = jax.jit(lambda q: jax.lax.fori_loop(
                    0, n, lambda i, a: body(a, k, v, bias, mask), q))
                np.asarray(reduce(f(q)))  # compile+warm
                t0 = time.perf_counter()
                np.asarray(reduce(f(q)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(reduce(f(f(f(q)))))
                t3 = time.perf_counter() - t0
                return (t3 - t1) / (2 * n) * 1e3

            try:
                tx = timeit(fx)
            except Exception as e:  # OOM etc.
                tx = float("nan")
                print(f"  xla failed: {e}", file=sys.stderr)
            try:
                tp = timeit(fp)
            except Exception as e:
                tp = float("nan")
                print(f"  pallas failed: {e}", file=sys.stderr)
            label = f"{name}{'+mask' if masked else '':6s}"
            print(f"{label:26s} {tx:9.3f} {tp:10.3f} {tx / tp:8.2f}")


if __name__ == "__main__":
    main()
