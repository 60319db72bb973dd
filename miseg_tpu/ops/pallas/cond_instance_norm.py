"""Fused conditional instance norm — Pallas TPU kernel.

The native-kernel analog of apex's `InstanceNorm3dNVFuser` that the
reference exposes via its `instance_nvfuser` factory
(networks/layers/factories.py:74,261-295), extended to the conditional
(per-modality parameter bank) case that is MI-Seg's scientific core.

Design:
  * input viewed as `[B, N, C]` (channel-last, N = prod(spatial));
  * pass 1: tiled accumulation of per-(B, C) sum / sum-of-squares in an
    f32 VMEM accumulator (grid iterates N-chunks sequentially, so
    accumulating into the output block is safe);
  * pass 2: normalize + per-sample affine with `(gamma, beta)` GATHERED by
    style id on the host side — the kernel sees dense `[B, C]` scale/shift
    and fuses an optional leaky-relu activation into the same HBM pass;
  * custom VJP: the backward uses the saved stats; dgamma/dbeta reduce to
    segment-sums over the batch by style (computed with jnp — tiny).

Numerics match `miseg_tpu.ops.norms.conditional_instance_norm` (f32
statistics, eps inside rsqrt) — asserted by tests in interpret mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _pick_chunk(n: int, c: int, budget_bytes: int = 256 * 1024) -> int:
    """N-chunk: a multiple-of-8 divisor of n within the VMEM budget, else n.

    Mosaic requires the block's sublane dim be divisible by 8 or equal to
    the full array dim; it also stack-allocates several block-sized
    temporaries (cast, normalized, affine, act), so blocks stay ≤256KB to
    keep well under the 16MB scoped-vmem limit with pipelining.
    """
    chunk = max(8, budget_bytes // (4 * max(c, 1)))
    chunk = min(chunk - chunk % 8, n)
    while chunk >= 8:
        if n % chunk == 0:
            return chunk
        chunk -= 8
    return n


def _stats_kernel(x_ref, acc_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)          # [TN, C]
    acc_ref[0, 0, :] += jnp.sum(x, axis=0)
    acc_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _norm_kernel(x_ref, stats_ref, g_ref, b_ref, o_ref, *, n_total: int,
                 eps: float, negative_slope: float | None):
    x = x_ref[0].astype(jnp.float32)          # [TN, C]
    s = stats_ref[0]                          # [2, C]
    mean = s[0] / n_total
    var = jnp.maximum(s[1] / n_total - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :]) * inv[None, :]
    y = y * g_ref[0, 0][None, :].astype(jnp.float32) \
        + b_ref[0, 0][None, :].astype(jnp.float32)
    if negative_slope is not None:
        y = jnp.where(y >= 0, y, negative_slope * y)
    o_ref[0] = y.astype(o_ref.dtype)


def _forward(x2d: Array, g: Array, b: Array, *, eps: float,
             negative_slope: float | None, interpret: bool):
    bsz, n, c = x2d.shape
    chunk = _pick_chunk(n, c)
    grid = (bsz, n // chunk)

    stats = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 2, c), jnp.float32),
        interpret=interpret,
    )(x2d)

    y = pl.pallas_call(
        functools.partial(_norm_kernel, n_total=n, eps=eps,
                          negative_slope=negative_slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, C] with block (1, 1, C): every block dim equals the
            # full dim or 1==full — Mosaic rejects sublane blocks of 1
            # over a larger batch dim in 2-D layouts
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(x2d, stats, g[:, None, :], b[:, None, :])
    return y, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _cin(x2d, styles, gamma, beta, eps, negative_slope, interpret):
    g = jnp.take(gamma, styles, axis=0, mode="clip")
    b = jnp.take(beta, styles, axis=0, mode="clip")
    y, _ = _forward(x2d, g, b, eps=eps, negative_slope=negative_slope,
                    interpret=interpret)
    return y


def _cin_fwd(x2d, styles, gamma, beta, eps, negative_slope, interpret):
    g = jnp.take(gamma, styles, axis=0, mode="clip")
    b = jnp.take(beta, styles, axis=0, mode="clip")
    y, stats = _forward(x2d, g, b, eps=eps, negative_slope=negative_slope,
                        interpret=interpret)
    return y, (x2d, styles, gamma.shape[0], g, stats, y)


def _cin_bwd(eps, negative_slope, interpret, res, dy):
    x2d, styles, num_styles, g, stats, y = res
    bsz, n, c = x2d.shape
    x = x2d.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    mean = (stats[:, 0, :] / n)[:, None, :]
    var = jnp.maximum(stats[:, 1, :] / n - jnp.square(mean[:, 0, :]), 0.0)
    inv = jax.lax.rsqrt(var + eps)[:, None, :]
    xhat = (x - mean) * inv
    if negative_slope is not None:
        dy = jnp.where(y >= 0, dy, negative_slope * dy)
    gb = g[:, None, :].astype(jnp.float32)
    dxhat = dy * gb
    # instance-norm backward (per sample/channel reductions over N)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    dgam_rows = jnp.sum(dy * xhat, axis=1)   # [B, C]
    dbet_rows = jnp.sum(dy, axis=1)          # [B, C]
    onehot = jax.nn.one_hot(styles, num_styles, dtype=jnp.float32)  # [B, S]
    dgamma = jnp.einsum("bs,bc->sc", onehot, dgam_rows)
    dbeta = jnp.einsum("bs,bc->sc", onehot, dbet_rows)
    return dx.astype(x2d.dtype), None, dgamma, dbeta


_cin.defvjp(_cin_fwd, _cin_bwd)


def fused_conditional_instance_norm(x: Array, styles: Array, gamma: Array,
                                    beta: Array, *, eps: float = 1e-5,
                                    negative_slope: float | None = None,
                                    interpret: bool | None = None) -> Array:
    """Pallas-fused conditional instance norm over `[B, *spatial, C]`.

    `negative_slope` fuses a trailing leaky-relu into the normalize pass.
    `interpret=None` auto-selects interpreter mode off-TPU so tests run on
    CPU with identical semantics.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    shape = x.shape
    bsz, c = shape[0], shape[-1]
    n = math.prod(shape[1:-1])
    y = _cin(x.reshape(bsz, n, c), styles, gamma, beta, eps, negative_slope,
             interpret)
    return y.reshape(shape)
