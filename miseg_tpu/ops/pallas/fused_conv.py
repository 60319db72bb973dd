"""Fused 3x3x3 conv (+ input norm-affine + leaky) + output stats — Pallas.

THE hot structure of the dynunet/UNETR conv blocks is
`conv3 -> instance-norm -> leaky-relu -> conv3 -> instance-norm (+res) -> act`
(dynunet_block.py:25-126).  Profiling (BASELINE.md round-2 table) shows the
XLA lowering spends ~21ms of the 38.7ms flagship window in layout
transforms around these convs: the 48-channel minor dim forces 2.67x
lane-padded transposed copies between every conv and its norm.

This kernel keeps the whole chain in ONE layout: activations stream as
dense `[Z, Y, X, C]` z-planes, each grid step computes one output plane
from three input planes (halo via three clamped views of the same array),
applying the PREVIOUS norm's per-channel affine + leaky on the fly to the
loaded planes (normalize-on-read), accumulating the 27-tap conv in an f32
VMEM scratch, and folding the output's per-channel (sum, sum-sq) into a
stats accumulator so the NEXT norm needs no extra pass.

Forward is Pallas; backward is `jax.vjp` over an equivalent jnp/lax
reference (XLA conv kernels — correctness by construction).  Off-TPU the
kernel runs in interpret mode; tests assert parity with the reference.

Scope: stride 1, kernel 3 (the dynunet/UNETR encoder-decoder case),
3D channel-last, same-padding with zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _transform(plane, scale_ref, shift_ref, slope):
    """Input transform: optional per-channel affine, optional leaky (f32)."""
    p = plane.astype(jnp.float32)
    if scale_ref is not None:
        p = p * scale_ref[0, 0][None, None, :] + shift_ref[0, 0][None, None, :]
    if slope is not None:
        p = jnp.where(p >= 0, p, slope * p)
    return p


def _conv_kernel(xm_ref, x0_ref, xp_ref, w_ref, scale_ref, shift_ref,
                 o_ref, stats_ref, *, slope, out_dtype):
    z = pl.program_id(1)
    nz = pl.num_programs(1)
    ny, nx = o_ref.shape[2], o_ref.shape[3]
    cout = o_ref.shape[4]

    planes = ((xm_ref, (z > 0).astype(jnp.float32), 0),
              (x0_ref, jnp.float32(1.0), 1),
              (xp_ref, (z < nz - 1).astype(jnp.float32), 2))
    acc = jnp.zeros((ny, nx, cout), jnp.float32)  # vreg-resident partials
    for ref, valid, kz in planes:
        p = _transform(ref[0, 0], scale_ref, shift_ref, slope) * valid
        pb = p.astype(out_dtype)  # match the reference conv's operand dtype
        # one zero border instead of 27 per-tap edge masks: taps become
        # static slices — cheap on the outer (y) dim, one shifted copy per
        # x offset on the sublane dim
        zp = jnp.pad(pb, ((1, 1), (1, 1), (0, 0)))
        for dx in (0, 1, 2):
            sx = zp[:, dx:dx + nx, :]                # [Y+2, X, Cin]
            for dy in (0, 1, 2):
                src = sx[dy:dy + ny]                 # [Y, X, Cin]
                tap = w_ref[kz, dy, dx]              # [Cin, Cout]
                acc = acc + lax.dot_general(
                    src, tap, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [Y, X, Cout]

    # stats come from the STORED (dtype-rounded) output — matching what the
    # unfused path's norm reads back from HBM
    y = acc.astype(out_dtype)

    @pl.when(z == 0)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    y32 = y.astype(jnp.float32)
    stats_ref[0, 0, :] += jnp.sum(y32, axis=(0, 1))
    stats_ref[0, 1, :] += jnp.sum(y32 * y32, axis=(0, 1))
    o_ref[0, 0] = y


def _conv_kernel_plain(xm_ref, x0_ref, xp_ref, w_ref, o_ref, stats_ref,
                       *, slope, out_dtype):
    _conv_kernel(xm_ref, x0_ref, xp_ref, w_ref, None, None, o_ref,
                 stats_ref, slope=slope, out_dtype=out_dtype)


def _pallas_conv(x, w, scale, shift, *, slope, interpret: bool):
    b, z, y, xdim, cin = x.shape
    cout = w.shape[-1]

    def plane_spec(dz):
        return pl.BlockSpec(
            (1, 1, y, xdim, cin),
            lambda i, j, dz=dz: (i, jnp.clip(j + dz, 0, z - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)

    spec_w = pl.BlockSpec((3, 3, 3, cin, cout), lambda i, j: (0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 1, y, xdim, cout), lambda i, j: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_stats = pl.BlockSpec((1, 2, cout), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((b, z, y, xdim, cout), x.dtype),
                 jax.ShapeDtypeStruct((b, 2, cout), jnp.float32))
    out_specs = (spec_o, spec_stats)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    grid = (b, z)
    if scale is not None:
        yv, stats = pl.pallas_call(
            functools.partial(_conv_kernel, slope=slope, out_dtype=x.dtype),
            grid=grid,
            in_specs=[plane_spec(-1), plane_spec(0), plane_spec(1), spec_w,
                      spec_vec, spec_vec],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, x, x, w, scale[:, None, :], shift[:, None, :])
    else:
        yv, stats = pl.pallas_call(
            functools.partial(_conv_kernel_plain, slope=slope,
                              out_dtype=x.dtype),
            grid=grid,
            in_specs=[plane_spec(-1), plane_spec(0), plane_spec(1), spec_w],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(x, x, x, w)
    return yv, stats


def _reference(x, w, scale, shift, slope):
    """jnp/lax equivalent (same math, XLA kernels) — used by the VJP."""
    t = x.astype(jnp.float32)
    if scale is not None:
        bshape = (x.shape[0],) + (1,) * 3 + (x.shape[-1],)
        t = t * scale.reshape(bshape) + shift.reshape(bshape)
    if slope is not None:
        t = jnp.where(t >= 0, t, slope * t)
    t = t.astype(x.dtype)
    # operand-dtype conv (TPU accumulates bf16 convs in f32 internally,
    # like the kernel's f32 partials); no preferred_element_type — its vjp
    # mixes bf16/f32 operands and conv_general_dilated rejects that
    yv = lax.conv_general_dilated(
        t, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y32 = yv.astype(jnp.float32)
    s0 = jnp.sum(y32, axis=(1, 2, 3))
    s1 = jnp.sum(y32 * y32, axis=(1, 2, 3))
    return yv, jnp.stack([s0, s1], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fconv(x, w, scale, shift, slope, interpret):
    return _pallas_conv(x, w, scale, shift, slope=slope, interpret=interpret)


def _fconv_fwd(x, w, scale, shift, slope, interpret):
    out = _pallas_conv(x, w, scale, shift, slope=slope, interpret=interpret)
    return out, (x, w, scale, shift)


def _fconv_bwd(slope, interpret, res, cts):
    x, w, scale, shift = res
    if scale is None:
        def ref2(x_, w_):
            return _reference(x_, w_, None, None, slope)
        _, vjp = jax.vjp(ref2, x, w)
        dx, dw = vjp(cts)
        return dx, dw, None, None
    def ref4(x_, w_, sc_, sh_):
        return _reference(x_, w_, sc_, sh_, slope)
    _, vjp = jax.vjp(ref4, x, w, scale, shift)
    return vjp(cts)


_fconv.defvjp(_fconv_fwd, _fconv_bwd)


def supported(x_shape: tuple[int, ...], kernel_size, strides,
              out_channels: int | None = None) -> bool:
    """3D, kernel 3, stride 1, spatial dims present, and the per-step VMEM
    working set (3 haloed input planes + padded copies + f32 partials +
    output plane + weights) within the raised 100MB limit — oversized
    planes fall back to XLA instead of failing at Mosaic compile."""
    if len(x_shape) != 5:
        return False
    ks = kernel_size if isinstance(kernel_size, (list, tuple)) else (kernel_size,) * 3
    ss = strides if isinstance(strides, (list, tuple)) else (strides,) * 3
    if tuple(ks) != (3, 3, 3) or tuple(ss) != (1, 1, 1):
        return False
    _, z, y, xd, cin = x_shape
    if not (z >= 2 and y >= 2 and xd >= 2):
        return False
    cout = out_channels if out_channels is not None else cin
    lane = lambda c: -(-c // 128) * 128  # VMEM lane padding
    plane = y * xd
    # worst case f32 (model init traces in f32): 3 in-planes + 3 zero-
    # padded copies + acc + out + a temporary, plus the full weight block
    est = plane * (6 * lane(cin) + 3 * lane(cout)) * 4 \
        + 27 * cin * lane(cout) * 4
    return est <= 80 * 1024 * 1024


def conv3_norm_stats(x: Array, w: Array, scale: Array | None = None,
                     shift: Array | None = None, *,
                     slope: float | None = None,
                     interpret: bool | None = None) -> tuple[Array, Array]:
    """y = conv3(leaky(x * scale + shift)); also returns y's per-channel
    (sum, sum-sq) `f32 [B, 2, Cout]` so the following norm needs no extra
    read pass.

    x: `[B, Z, Y, X, Cin]`; w: `[3,3,3,Cin,Cout]`; scale/shift: optional
    `f32 [B, Cin]` (the previous instance norm's per-sample affine,
    normalize-on-read); slope: leaky negative_slope fused after the affine.
    """
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    if scale is not None:
        scale = scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)
    return _fconv(x, w, scale, shift, slope, interpret)


# the stats -> (scale, shift) column fold is owned by fused_norm (one
# implementation for every fused consumer); re-exported here because the
# dynunet fused path reads it alongside conv3_norm_stats
from .fused_norm import norm_columns  # noqa: E402,F401
