"""Fused windowed-attention Pallas kernel (the Swin hot loop).

The C-Swin-UNETR per-step hot path is windowed MHSA over 343-token (7³)
windows (SURVEY §3.4: O(nWin·343²·C)).  A naive XLA lowering materializes
the `[B·nW, heads, N, N]` attention tensor in HBM (hundreds of MB at
stage 1).  This kernel computes QKᵀ·scale + rel-pos-bias (+ shifted-window
mask) → softmax → ·V for ONE window per grid step entirely in VMEM — the
attention matrix never touches HBM.

Forward is Pallas; backward is a custom VJP that recomputes the attention
weights with jnp einsums (flash-style recompute — HBM-cheap, and XLA
fuses it well).  Off-TPU the kernel runs in interpret mode, so tests
assert exact parity with the jnp reference on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _head_group(num_heads: int, n: int) -> int:
    """Heads per grid step: the largest divisor of num_heads whose
    per-step score temporaries (~3 × HG × N² f32) stay well under the
    16MB scoped-vmem stack (12 heads × 343² overflows)."""
    budget = 6 * 1024 * 1024
    max_hg = max(1, budget // max(1, 3 * n * n * 4))
    hg = 1
    for cand in range(1, num_heads + 1):
        if num_heads % cand == 0 and cand <= max_hg:
            hg = cand
    return hg


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 scale: float, num_heads: int):
    """One (window, head-group) per grid step; heads traversed with a
    static loop (amortizes the mask block residency; Mosaic rejects
    lane-splitting reshapes and traced dynamic slices)."""
    for h in range(num_heads):
        q = q_ref[0, h].astype(jnp.float32) * scale   # [N, hd]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [N, N]
        s = s + bias_ref[h]
        if mask_ref is not None:
            s = s + mask_ref[0]
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, h] = jnp.dot(p, v, preferred_element_type=jnp.float32) \
            .astype(o_ref.dtype)


def _attn_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                        num_heads: int):
    _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref, scale=scale,
                 num_heads=num_heads)


def _pallas_forward(q, k, v, bias, mask, *, num_heads: int, interpret: bool):
    bw, n, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5

    def split(x):  # [BW, N, C] → [BW, H, N, hd]
        return x.reshape(bw, n, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    hg = _head_group(num_heads, n)
    spec_tok = pl.BlockSpec((1, hg, n, hd), lambda i, g: (i, g, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((hg, n, n), lambda i, g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    grid = (bw, num_heads // hg)
    if mask is not None:
        nw = mask.shape[0]
        spec_mask = pl.BlockSpec((1, n, n), lambda i, g: (i % nw, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, num_heads=hg),
            grid=grid,
            in_specs=[spec_tok, spec_tok, spec_tok, spec_bias, spec_mask],
            out_specs=spec_tok,
            out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
            interpret=interpret,
        )(qh, kh, vh, bias, mask)
    else:
        out = pl.pallas_call(
            functools.partial(_attn_kernel_nomask, scale=scale,
                              num_heads=hg),
            grid=grid,
            in_specs=[spec_tok, spec_tok, spec_tok, spec_bias],
            out_specs=spec_tok,
            out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
            interpret=interpret,
        )(qh, kh, vh, bias)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)


def _reference_weights(q, k, bias, mask, num_heads):
    """jnp attention weights (used by the backward recompute)."""
    bw, n, c = q.shape
    hd = c // num_heads
    qh = q.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    kh = k.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * (hd ** -0.5)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(bw // nw, nw, num_heads, n, n) \
            + mask[None, :, None].astype(jnp.float32)
        s = s.reshape(bw, num_heads, n, n)
    return jax.nn.softmax(s, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fwa(q, k, v, bias, mask, num_heads, interpret):
    return _pallas_forward(q, k, v, bias, mask, num_heads=num_heads,
                           interpret=interpret)


def _fwa_fwd(q, k, v, bias, mask, num_heads, interpret):
    out = _pallas_forward(q, k, v, bias, mask, num_heads=num_heads,
                          interpret=interpret)
    return out, (q, k, v, bias, mask)


def _fwa_bwd(num_heads, interpret, res, do):
    q, k, v, bias, mask = res
    bw, n, c = q.shape
    hd = c // num_heads
    p = _reference_weights(q, k, bias, mask, num_heads)      # [BW, H, N, N]
    vh = v.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    doh = do.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    dp = jnp.einsum("bnhd,bmhd->bhnm", doh, vh)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, doh).reshape(bw, n, c)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax bwd
    qh = q.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    kh = k.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    scale = hd ** -0.5
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, kh).reshape(bw, n, c) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, qh).reshape(bw, n, c) * scale
    dbias = jnp.sum(ds, axis=0)                               # [H, N, N]
    dmask = None
    if mask is not None:
        nw = mask.shape[0]
        dmask = jnp.sum(ds.reshape(bw // nw, nw, num_heads, n, n),
                        axis=(0, 2)).astype(mask.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


_fwa.defvjp(_fwa_fwd, _fwa_bwd)


def fused_window_attention(q: Array, k: Array, v: Array, bias: Array,
                           mask: Array | None = None, *, num_heads: int,
                           interpret: bool | None = None) -> Array:
    """Fused windowed MHSA.

    q/k/v: `[B·nW, N, C]`; bias: `[H, N, N]` rel-pos bias; mask: optional
    `[nW, N, N]` shifted-window mask (broadcast over batch as in
    window_attention.py:110-114).  Returns `[B·nW, N, C]`.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _fwa(q, k, v, bias, mask, num_heads, interpret)
