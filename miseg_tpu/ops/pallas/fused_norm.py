"""Fused instance norm (+affine, +leaky-relu, +residual add) — Pallas TPU.

The native-kernel analog of apex `InstanceNorm3dNVFuser` that the reference
exposes via its `instance_nvfuser` factory (networks/layers/factories.py:
74,261-295), covering both the plain and the conditional (per-modality
parameter bank) instance norm that is MI-Seg's scientific core
(networks/norms/conditional_instance_norm.py:27-107).

Design: the tensor is viewed as `[B, R, M]` with `M = C * (trailing
spatial dims)` chosen so `M % 128 == 0` — every block is lane-dense, the
stats pass streams at full HBM bandwidth, and the apply pass is a single
fused multiply-add (+ optional leaky-relu + optional residual add).

Measured verdict (v5e, BASELINE.md round-2 table): the kernel is
bandwidth-optimal in isolation but LOSES end-to-end — XLA fuses each
norm's apply with the next norm's stats and keeps everything in the conv
chain's layouts, while this kernel forces default layouts at its
boundaries.  It stays OPT-IN (`MISEG_PALLAS_NORM`), hardware-certified
(`scripts/tpu_parity.py`), and is the backing implementation for the
fused-conv chain's column applies, where the layout argument differs.

Pass structure per call (x viewed `[B, R, M]`):
  1. stats kernel: grid-(B, R/TR) accumulation of per-column sum / sum-sq
     into an f32 `[B, 2, M]` accumulator (sequential inner grid → safe);
  2. host fold (tiny jnp): `[B,2,M] → [B,2,C]` by summing the M/C column
     groups, then `scale_col = inv_std * gamma`, `shift_col = beta -
     mean * scale_col`, tiled back to `[B, M]`;
  3. apply kernel: `y = x * scale_col + shift_col` (+ `add`, + leaky-relu)
     in ONE read-write pass.

Backward is a custom VJP in jnp on the same merged dense view (per-channel
reductions fold `[B,R,M] → [B,C]` through dense `[.., M//C, C]` sums).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def merge_view(shape: tuple[int, ...]) -> tuple[int, int] | None:
    """`[B, *spatial, C] -> (R, M)` with `M = C * trailing-spatial` a
    multiple of 128 (lane-dense).  None when no suffix merge achieves it."""
    _, *spatial, c = shape
    m = c
    rest = list(spatial)
    while m % 128 and rest:
        m *= rest.pop()
    if m % 128:
        return None
    return int(np.prod(rest)) if rest else 1, m


def _pick_rows(r: int, m: int, budget: int = 12 * 1024 * 1024) -> int | None:
    """Rows per block: a multiple-of-8 divisor of r (or r itself) small
    enough for the 16MB scoped-VMEM stack.  Mosaic stack-allocates the
    input/output blocks plus several f32 temporaries (cast, fma, select),
    ~5 block-sized f32 values worst case (f32 inputs at model init)."""
    cap = budget // (20 * m)
    if r <= max(cap, 1):
        return r
    tr = min(r - r % 8, cap - cap % 8)
    while tr >= 8:
        if r % tr == 0:
            return tr
        tr -= 8
    return None


def _stats_kernel(x_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)          # [TR, M]
    acc_ref[0, 0, :] += jnp.sum(x, axis=0)
    acc_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, s_ref, h_ref, o_ref, *, slope):
    x = x_ref[0].astype(jnp.float32)          # [TR, M]
    y = x * s_ref[0, 0][None, :] + h_ref[0, 0][None, :]
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    o_ref[0] = y.astype(o_ref.dtype)


def _apply_add_kernel(x_ref, s_ref, h_ref, a_ref, o_ref, *, slope):
    x = x_ref[0].astype(jnp.float32)
    y = x * s_ref[0, 0][None, :] + h_ref[0, 0][None, :]
    y = y + a_ref[0].astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    o_ref[0] = y.astype(o_ref.dtype)


def _require_rows(r: int, m: int, budget: int = 12 * 1024 * 1024) -> int:
    tr = _pick_rows(r, m, budget=budget)
    if tr is None:
        raise ValueError(f"no row blocking for merged view ({r}, {m}); "
                         "check supported() before dispatching")
    return tr


def _stats(x3, *, interpret: bool):
    """Per-column sums: `[B, R, M] -> f32 [B, 2, M]`."""
    bsz, r, m = x3.shape
    tr = _require_rows(r, m)
    return pl.pallas_call(
        _stats_kernel,
        grid=(bsz, r // tr),
        in_specs=[pl.BlockSpec((1, tr, m), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, m), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 2, m), jnp.float32),
        interpret=interpret,
    )(x3)


def _apply(x3, scale_m, shift_m, add3, *, slope, interpret: bool):
    bsz, r, m = x3.shape
    # two streamed blocks (x + add) double the per-row stack cost
    tr = _require_rows(r, m, budget=(6 if add3 is not None else 12) * 1024 * 1024)
    spec_x = pl.BlockSpec((1, tr, m), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    # [B, 1, M] with block (1, 1, M): every block dim equals the full dim
    # (Mosaic rejects sublane blocks of 1 over a larger dim in 2-D layouts)
    spec_v = pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    if add3 is None:
        return pl.pallas_call(
            functools.partial(_apply_kernel, slope=slope),
            grid=(bsz, r // tr),
            in_specs=[spec_x, spec_v, spec_v],
            out_specs=spec_x,
            out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
            interpret=interpret,
        )(x3, scale_m[:, None, :], shift_m[:, None, :])
    return pl.pallas_call(
        functools.partial(_apply_add_kernel, slope=slope),
        grid=(bsz, r // tr),
        in_specs=[spec_x, spec_v, spec_v, spec_x],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(x3, scale_m[:, None, :], shift_m[:, None, :], add3)


def fold_stats(stats, n_total: int, eps: float):
    """Per-channel `[B, 2, C]` (sum, sum-sq) -> (mean, inv_std) `[B, C]`."""
    mean = stats[:, 0] / n_total
    var = jnp.maximum(stats[:, 1] / n_total - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _gather_affine(gamma, beta, styles, bsz: int, c: int):
    """Resolve (gamma, beta) to dense per-sample `[B, C]` f32 rows."""
    if gamma is None:
        return (jnp.ones((bsz, c), jnp.float32),
                jnp.zeros((bsz, c), jnp.float32))
    g32 = gamma.astype(jnp.float32)
    b32 = beta.astype(jnp.float32)
    if g32.ndim == 2:  # conditional: [S, C] banks gathered by style id
        return (jnp.take(g32, styles, axis=0, mode="clip"),
                jnp.take(b32, styles, axis=0, mode="clip"))
    return (jnp.broadcast_to(g32, (bsz, c)),
            jnp.broadcast_to(b32, (bsz, c)))


def norm_columns(stats: Array, n_total: int, gamma: Array | None,
                 beta: Array | None, styles: Array | None,
                 eps: float = 1e-5) -> tuple[Array, Array]:
    """Fold `[B, 2, C]` stats into per-sample (scale, shift) `f32 [B, C]`
    implementing `gamma * (x - mean) / std + beta` — the shared column
    math of every fused-norm consumer (also re-exported by fused_conv)."""
    mean, inv = fold_stats(stats, n_total, eps)
    g, b = _gather_affine(gamma, beta, styles, *mean.shape)
    scale = inv * g
    return scale, b - mean * scale


def _fold_stats(stats, c: int, n_total: int, eps: float):
    """`[B, 2, M] -> (mean, inv) [B, C]` in f32."""
    bsz, _, m = stats.shape
    sums = stats.reshape(bsz, 2, m // c, c).sum(axis=2)   # [B, 2, C]
    return fold_stats(sums, n_total, eps)


def _columns(mean, inv, g, b, m: int):
    """Per-column scale/shift `[B, M]` from per-channel stats/affine."""
    scale_c = inv * g                         # [B, C]
    shift_c = b - mean * scale_c
    reps = m // scale_c.shape[-1]
    return (jnp.tile(scale_c, (1, reps)), jnp.tile(shift_c, (1, reps)))


def _forward(x3, add3, g_b, b_b, c, eps, slope, interpret):
    bsz, r, m = x3.shape
    n_total = r * (m // c)
    stats = _stats(x3, interpret=interpret)
    mean, inv = _fold_stats(stats, c, n_total, eps)
    scale_m, shift_m = _columns(mean, inv, g_b, b_b, m)
    y = _apply(x3, scale_m, shift_m, add3, slope=slope, interpret=interpret)
    return y, mean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fin(x3, add3, styles, gamma, beta, c, eps, slope, interpret):
    g_b, b_b = _gather_affine(gamma, beta, styles, x3.shape[0], c)
    y, _, _ = _forward(x3, add3, g_b, b_b, c, eps, slope, interpret)
    return y


def _fin_fwd(x3, add3, styles, gamma, beta, c, eps, slope, interpret):
    g_b, b_b = _gather_affine(gamma, beta, styles, x3.shape[0], c)
    y, mean, inv = _forward(x3, add3, g_b, b_b, c, eps, slope, interpret)
    return y, (x3, styles, g_b, mean, inv, y, add3 is not None, gamma)


def _fin_bwd(c, eps, slope, interpret, res, dy):
    x3, styles, g_b, mean, inv, y, has_add, gamma = res
    bsz, r, m = x3.shape
    reps = m // c
    n_total = r * reps
    dy32 = dy.astype(jnp.float32)
    if slope is not None:
        # leaky-relu preserves sign, so sign(y) == sign(pre-act)
        dy32 = jnp.where(y >= 0, dy32, slope * dy32)
    d_add = dy32.astype(x3.dtype) if has_add else None

    mean_m = jnp.tile(mean, (1, reps))[:, None, :]      # [B, 1, M]
    inv_m = jnp.tile(inv, (1, reps))[:, None, :]
    g_m = jnp.tile(g_b, (1, reps))[:, None, :]
    xhat = (x3.astype(jnp.float32) - mean_m) * inv_m
    dxhat = dy32 * g_m

    def fold(t):  # [B, R, M] -> [B, C] channel sums via the dense view
        return t.reshape(bsz, r, reps, c).sum(axis=(1, 2))

    m1 = fold(dxhat) / n_total                           # [B, C]
    m2 = fold(dxhat * xhat) / n_total
    dx = (dxhat - jnp.tile(m1, (1, reps))[:, None, :]
          - xhat * jnp.tile(m2, (1, reps))[:, None, :]) * inv_m
    dgamma = dbeta = None
    if gamma is not None:
        gdt = gamma.dtype
        dgam_rows = fold(dy32 * xhat)                    # [B, C]
        dbet_rows = fold(dy32)
        if gamma.ndim == 2:  # conditional banks: segment-sum by style
            # clip like the forward gather: out-of-range ids route their
            # gradient to the clamped bank (matches autodiff of
            # take(mode="clip")), not nowhere
            styles_c = jnp.clip(styles, 0, gamma.shape[0] - 1)
            onehot = jax.nn.one_hot(styles_c, gamma.shape[0],
                                    dtype=jnp.float32)
            dgamma = jnp.einsum("bs,bc->sc", onehot, dgam_rows).astype(gdt)
            dbeta = jnp.einsum("bs,bc->sc", onehot, dbet_rows).astype(gdt)
        else:
            dgamma = dgam_rows.sum(0).astype(gdt)
            dbeta = dbet_rows.sum(0).astype(gdt)
    return dx.astype(x3.dtype), d_add, None, dgamma, dbeta


_fin.defvjp(_fin_fwd, _fin_bwd)


def _apply2_kernel(x_ref, sx_ref, hx_ref, r_ref, sr_ref, hr_ref, o_ref, *,
                   slope):
    x = x_ref[0].astype(jnp.float32)
    r = r_ref[0].astype(jnp.float32)
    y = (x * sx_ref[0, 0][None, :] + hx_ref[0, 0][None, :]
         + r * sr_ref[0, 0][None, :] + hr_ref[0, 0][None, :])
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _apply2(x3, sx, hx, r3, sr, hr, c, slope, interpret):
    bsz, r, m = x3.shape
    tr = _require_rows(r, m, budget=6 * 1024 * 1024)  # two streamed blocks
    spec_x = pl.BlockSpec((1, tr, m), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    reps = m // c
    cols = [jnp.tile(v, (1, reps))[:, None, :] for v in (sx, hx, sr, hr)]
    return pl.pallas_call(
        functools.partial(_apply2_kernel, slope=slope),
        grid=(bsz, r // tr),
        in_specs=[spec_x, spec_v, spec_v, spec_x, spec_v, spec_v],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=interpret,
    )(x3, cols[0], cols[1], r3, cols[2], cols[3])


def _apply2_fwd(x3, sx, hx, r3, sr, hr, c, slope, interpret):
    y = _apply2(x3, sx, hx, r3, sr, hr, c, slope, interpret)
    return y, (x3, sx, r3, sr, y)


def _apply2_bwd(c, slope, interpret, res, dy):
    x3, sx, r3, sr, y = res
    bsz, r, m = x3.shape
    reps = m // c
    dy32 = dy.astype(jnp.float32)
    if slope is not None:
        dy32 = jnp.where(y >= 0, dy32, slope * dy32)

    def fold(t):  # [B, R, M] -> [B, C]
        return t.reshape(bsz, r, reps, c).sum(axis=(1, 2))

    sx_m = jnp.tile(sx, (1, reps))[:, None, :]
    sr_m = jnp.tile(sr, (1, reps))[:, None, :]
    x32 = x3.astype(jnp.float32)
    r32 = r3.astype(jnp.float32)
    dh = fold(dy32)
    return ((dy32 * sx_m).astype(x3.dtype), fold(dy32 * x32), dh,
            (dy32 * sr_m).astype(r3.dtype), fold(dy32 * r32), dh)


_apply2.defvjp(_apply2_fwd, _apply2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _apply1(x3, sx, hx, c, slope, interpret):
    bsz, r, m = x3.shape
    reps = m // c
    scale_m = jnp.tile(sx, (1, reps))
    shift_m = jnp.tile(hx, (1, reps))
    return _apply(x3, scale_m, shift_m, None, slope=slope,
                  interpret=interpret)


def _apply1_fwd(x3, sx, hx, c, slope, interpret):
    y = _apply1(x3, sx, hx, c, slope, interpret)
    return y, (x3, sx, y)


def _apply1_bwd(c, slope, interpret, res, dy):
    x3, sx, y = res
    bsz, r, m = x3.shape
    reps = m // c
    dy32 = dy.astype(jnp.float32)
    if slope is not None:
        dy32 = jnp.where(y >= 0, dy32, slope * dy32)
    sx_m = jnp.tile(sx, (1, reps))[:, None, :]

    def fold(t):
        return t.reshape(bsz, r, reps, c).sum(axis=(1, 2))

    return ((dy32 * sx_m).astype(x3.dtype),
            fold(dy32 * x3.astype(jnp.float32)), fold(dy32))


_apply1.defvjp(_apply1_fwd, _apply1_bwd)


def apply_norm_act(x: Array, sx: Array, hx: Array, *,
                   negative_slope: float | None = None,
                   interpret: bool | None = None) -> Array:
    """`leaky(x * sx + hx)` in one HBM pass, columns `f32 [B, C]`."""
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    shape = x.shape
    mv = merge_view(shape)
    if mv is None:
        raise ValueError(f"no lane-dense merge for {shape}")
    y = _apply1(x.reshape(shape[0], *mv), sx.astype(jnp.float32),
                hx.astype(jnp.float32), shape[-1], negative_slope, interpret)
    return y.reshape(shape)


def apply_norm2_act(x: Array, sx: Array, hx: Array, res: Array, sr: Array,
                    hr: Array, *, negative_slope: float | None = None,
                    interpret: bool | None = None) -> Array:
    """`leaky((x*sx + hx) + (res*sr + hr))` in ONE HBM pass — the
    UnetResBlock tail with BOTH branches' instance norms folded into
    per-channel columns (dynunet_block.py:120-125).

    x/res: `[B, *spatial, C]`; sx/hx/sr/hr: `f32 [B, C]` columns
    (`fused_conv.norm_columns`).
    """
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    shape = x.shape
    mv = merge_view(shape)
    if mv is None:
        raise ValueError(f"no lane-dense merge for {shape}")
    r, m = mv
    c = shape[-1]
    y = _apply2(x.reshape(shape[0], r, m), sx.astype(jnp.float32),
                hx.astype(jnp.float32), res.reshape(shape[0], r, m),
                sr.astype(jnp.float32), hr.astype(jnp.float32),
                c, negative_slope, interpret)
    return y.reshape(shape)


def channel_stats(x: Array, *, interpret: bool | None = None) -> Array:
    """Per-channel (sum, sum-sq) `f32 [B, 2, C]` over `[B, *spatial, C]` —
    Pallas dense-merged when possible, jnp otherwise."""
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    shape = x.shape
    c = shape[-1]
    mv = merge_view(shape)
    if mv is not None and _pick_rows(*mv) is not None:
        x3 = x.reshape(shape[0], *mv)
        stats = _stats_p(x3, interpret)
        return stats.reshape(shape[0], 2, mv[1] // c, c).sum(axis=2)
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    return jnp.stack([jnp.sum(x32, axis=axes),
                      jnp.sum(x32 * x32, axis=axes)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _stats_p(x3, interpret):
    return _stats(x3, interpret=interpret)


def _stats_p_fwd(x3, interpret):
    return _stats(x3, interpret=interpret), x3


def _stats_p_bwd(interpret, x3, ds):
    # d(sum)/dx = ds0 broadcast; d(sum-sq)/dx = 2 x ds1
    bsz, r, m = x3.shape
    ds0 = ds[:, 0][:, None, :]
    ds1 = ds[:, 1][:, None, :]
    return ((ds0 + 2.0 * x3.astype(jnp.float32) * ds1).astype(x3.dtype),)


_stats_p.defvjp(_stats_p_fwd, _stats_p_bwd)


def supported(shape: tuple[int, ...]) -> bool:
    """True when this kernel can run on `[B, *spatial, C]` (a lane-dense
    merge exists and the row dim blocks cleanly).  Checked against the
    WORST-CASE budget (the 6MB two-streamed-block applies) so every
    dispatchable path — including residual adds — compiles."""
    if len(shape) < 3:
        return False
    mv = merge_view(shape)
    return mv is not None and _pick_rows(*mv, budget=6 * 1024 * 1024) is not None


def fused_instance_norm_act(
        x: Array, gamma: Array | None = None, beta: Array | None = None,
        styles: Array | None = None, *, eps: float = 1e-5,
        negative_slope: float | None = None, add: Array | None = None,
        interpret: bool | None = None) -> Array:
    """Instance norm over `[B, *spatial, C]` with everything fused.

    gamma/beta: None (parameter-free), `[C]` (plain affine), or `[S, C]`
    banks gathered by `styles: i32[B]` (conditional — MI-Seg's core).
    `negative_slope` fuses a trailing leaky-relu; `add` fuses a residual
    added AFTER the affine and BEFORE the activation (the UnetResBlock
    tail, dynunet_block.py:120-125).
    """
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    shape = x.shape
    mv = merge_view(shape)
    if mv is None:
        raise ValueError(f"no lane-dense merge for {shape}; "
                         "check supported() before dispatching")
    r, m = mv
    c = shape[-1]
    x3 = x.reshape(shape[0], r, m)
    add3 = add.reshape(shape[0], r, m) if add is not None else None
    if gamma is not None and gamma.ndim == 2 and styles is None:
        raise ValueError("conditional banks need a styles vector")
    y = _fin(x3, add3, styles, gamma, beta, c, eps, negative_slope, interpret)
    return y.reshape(shape)
