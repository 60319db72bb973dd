"""Fused windowed-attention Pallas kernel (the Swin hot loop).

The C-Swin-UNETR per-step hot path is windowed MHSA over 343-token (7³)
windows (SURVEY §3.4: O(nWin·343²·C)).  A naive XLA lowering materializes
the `[B·nW, heads, N, N]` attention tensor in HBM (~484MB f32 at stage 1)
plus, when shifted, a `[nW, N, N]` additive mask (~161MB).  This kernel
computes QKᵀ·scale + rel-pos-bias (+ shifted-window mask) → softmax → ·V
for a GROUP of windows per grid step entirely in VMEM — neither the
attention matrix nor the mask ever touches HBM.

TPU-first layout choices (v2, after profiling v1):
  * q/k/v/out live as `[BW, H, hd, N]` with the 343-token axis MINOR —
    N pads to a 128-lane multiple (343→384, 12%) instead of the head dim
    (16→128, 8x) that a `[.., N, hd]` layout would pad;
  * dots run in bf16 with f32 accumulation (`preferred_element_type`) —
    the MXU fast path — rather than casting operands to f32;
  * the shifted-window mask is passed as REGION IDS `i32 [nW, N]` and the
    pairwise {0, -100} comparison happens in VMEM per step;
  * several windows are processed per grid step (`W | nW`), heads iterate
    in the inner grid dimension so window-group blocks are fetched once.

Forward is Pallas; backward is a custom VJP that recomputes the attention
weights with jnp einsums.  The backward transiently materializes the
`[BW, H, N, N]` weight/cotangent tensors in HBM (recompute saves only the
residual, not the backward's working set).  WONTFIX, measured (round 3,
v5e): the flagship train step with this kernel is 162.5 ms vs 165.3 ms
for the XLA control — the non-flash backward costs ≈0 on the train path
because XLA's own backward materializes the same tensors, so a blocked
flash backward has no e2e win to capture (BASELINE.md round-3 table).
Off-TPU the kernel runs in interpret mode, so tests assert exact
parity with the jnp reference on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..window import ATTN_MASK_VALUE

Array = jax.Array


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _pick_windows(base: int, n: int, budget: int = 48 * 1024 * 1024) -> int:
    """Windows per grid step: the largest divisor of `base` whose score
    temporaries (~4 × W × N² f32) fit the raised VMEM limit."""
    n2 = -(-n // 8) * 8 * _pad128(n)
    cap = max(1, budget // (16 * n2))
    best = 1
    for w in range(1, base + 1):
        if base % w == 0 and w <= cap:
            best = w
    return best


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, ids_ref, o_ref, *,
                 scale: float):
    """One (window-group, head) per grid step; blocks are `[W, 1, hd, N]`
    (token axis minor → lane-dense)."""
    q = q_ref[:, 0]                                   # [W, hd, N] bf16
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [W, N, N]
    s = s * scale + bias_ref[0][None]
    if ids_ref is not None:
        ids = ids_ref[:, 0]                           # [W, N] i32
        s = jnp.where(ids[:, None, :] != ids[:, :, None],
                      jnp.float32(ATTN_MASK_VALUE) + s, s)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[:, 0] = jax.lax.dot_general(
        v, p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref, scale=scale)


def _pallas_forward(q, k, v, bias, ids, *, num_heads: int, interpret: bool):
    bw, n, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5

    def split(x):  # [BW, N, C] → [BW, H, hd, N] (token axis minor)
        return x.reshape(bw, n, num_heads, hd).transpose(0, 2, 3, 1)

    qh, kh, vh = split(q), split(k), split(v)
    nw = ids.shape[0] if ids is not None else bw
    w = _pick_windows(nw, n)
    if bw % w:
        # grid flooring would leave trailing windows unwritten
        raise ValueError(f"window batch {bw} not a multiple of the mask's "
                         f"window count {nw} (group size {w})")
    grid = (bw // w, num_heads)
    spec_tok = pl.BlockSpec((w, 1, hd, n), lambda i, h: (i, h, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, n, n), lambda i, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    if ids is not None:
        nww = nw // w
        # ids as [nW, 1, N]: the 8/128-divisibility rule applies to the
        # LAST TWO block dims, so (W, 1, N) keeps the window-group dim free
        spec_ids = pl.BlockSpec((w, 1, n), lambda i, h: (i % nww, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=grid,
            in_specs=[spec_tok, spec_tok, spec_tok, spec_bias, spec_ids],
            out_specs=spec_tok,
            out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
            compiler_params=params,
            interpret=interpret,
        )(qh, kh, vh, bias, ids[:, None, :])
    else:
        out = pl.pallas_call(
            functools.partial(_attn_kernel_nomask, scale=scale),
            grid=grid,
            in_specs=[spec_tok, spec_tok, spec_tok, spec_bias],
            out_specs=spec_tok,
            out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
            compiler_params=params,
            interpret=interpret,
        )(qh, kh, vh, bias)
    return out.transpose(0, 3, 1, 2).reshape(bw, n, c)


def _reference_weights(q, k, bias, ids, num_heads):
    """jnp attention weights (used by the backward recompute)."""
    bw, n, c = q.shape
    hd = c // num_heads
    qh = q.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    kh = k.reshape(bw, n, num_heads, hd).astype(jnp.float32)
    s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * (hd ** -0.5)
    s = s + bias[None].astype(jnp.float32)
    if ids is not None:
        nw = ids.shape[0]
        neq = ids[:, None, :] != ids[:, :, None]        # [nW, N, N]
        s = s.reshape(bw // nw, nw, num_heads, n, n)
        s = jnp.where(neq[None, :, None], s + jnp.float32(ATTN_MASK_VALUE), s)
        s = s.reshape(bw, num_heads, n, n)
    return jax.nn.softmax(s, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fwa(q, k, v, bias, ids, num_heads, interpret):
    return _pallas_forward(q, k, v, bias, ids, num_heads=num_heads,
                           interpret=interpret)


def _fwa_fwd(q, k, v, bias, ids, num_heads, interpret):
    out = _pallas_forward(q, k, v, bias, ids, num_heads=num_heads,
                          interpret=interpret)
    return out, (q, k, v, bias, ids)


def _fwa_bwd(num_heads, interpret, res, do):
    q, k, v, bias, ids = res
    bw, n, c = q.shape
    hd = c // num_heads
    p = _reference_weights(q, k, bias, ids, num_heads)       # [BW, H, N, N]
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
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), None)


_fwa.defvjp(_fwa_fwd, _fwa_bwd)


def fused_window_attention(q: Array, k: Array, v: Array, bias: Array,
                           mask: Array | None = None, *, num_heads: int,
                           interpret: bool | None = None) -> Array:
    """Fused windowed MHSA.

    q/k/v: `[B·nW, N, C]`; bias: `[H, N, N]` rel-pos bias; mask: optional
    shifted-window mask as REGION IDS `i32 [nW, N]` (two tokens attend iff
    their ids match — window_attention.py:110-114 semantics) or as a
    legacy additive `[nW, N, N]` tensor (converted to ids via uniqueness
    of rows... not supported: pass ids).  Returns `[B·nW, N, C]`.
    """
    if mask is not None and mask.ndim != 2:
        raise ValueError("fused_window_attention expects region ids [nW, N] "
                         "(see ops.window.window_region_ids), "
                         f"got mask shape {mask.shape}")
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    return _fwa(q, k, v, bias, mask, num_heads, interpret)
