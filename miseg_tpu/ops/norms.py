"""Functional normalization ops (channel-last, fully vectorized).

The scientific core of the framework is *conditional instance
normalization*: one shared network holds `num_styles` independent
(gamma, beta) parameter banks and each sample in the batch selects its bank
by an integer modality id.

Reference semantics covered (MI-Seg):
  * `_ConditionalInstanceNorm{1,2,3}d` — bank of affine InstanceNorm
    modules, per-sample dispatch via a Python loop + torch.stack
    (networks/norms/conditional_instance_norm.py:27-60).
  * `parse_normalization` string → (name, kwargs) mapping
    (networks/norms/utils.py:1-16).

TPU-first design: instead of a per-sample module bank we store parameters
as `[num_styles, C]` arrays, gather `(gamma, beta)` rows with the modality
index vector, and run ONE vectorized instance norm over the batch.  This
keeps the jitted graph style-independent (no data-dependent control flow),
vmaps/shards trivially, and lifts the reference's restriction that the
style vector length must equal the batch (its sw_batch_size>1 failure
mode, conditional_instance_norm.py:46-47).

All ops take channel-last tensors `[B, *spatial, C]` and f32/bf16 inputs;
statistics are always computed in float32 for stability on TPU.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

Array = jax.Array


def _use_matmul_stats() -> bool:
    env = os.environ.get("MISEG_MATMUL_STATS", "").strip().lower()
    if env:
        return env not in ("0", "false", "off")
    return False  # measured e2e loser on v5e — see _stats_matmul docstring


def _stats_matmul(x: Array, eps: float):
    """Instance-norm stats as MXU matmuls: sum = 1ᵀ·X, sumsq = diag(XᵀX).

    Rationale: the big per-channel stat fusions run at 56–92 GB/s on the
    lane-padded full-res conv layouts ([96,96,8,13,48]-physical —
    `scripts/gap_accounting.py`, round 3), ~9 ms/window of the flagship
    forward; a dot contracts the same elements while streaming at matmul
    bandwidth, and the extra C× FLOPs of the Gram diagonal are free at
    C≈48.  MEASURED E2E VERDICT (v5e, round 3): LOSES — 22.0 patches/s /
    210 ms train vs 25.9 / 165 XLA.  Those "slow" fusions are multi-pass
    producer+stats+apply structures; extracting the stats into dots adds
    reads and breaks XLA's fusion instead of replacing passes.  Kept
    opt-in (MISEG_MATMUL_STATS=1) as a recorded negative, same lesson as
    the round-2 kernel campaign: wins must remove graph-level traffic,
    not re-implement single ops.
    """
    b, c = x.shape[0], x.shape[-1]
    s = math.prod(x.shape[1:-1])
    xf = x.reshape(b, s, c)
    ones = jnp.ones((s,), xf.dtype)
    ssum = jnp.einsum("s,bsc->bc", ones, xf,
                      preferred_element_type=jnp.float32)
    gram = jnp.einsum("bsc,bsd->bcd", xf, xf,
                      preferred_element_type=jnp.float32)
    sumsq = jnp.diagonal(gram, axis1=1, axis2=2)
    mean = ssum / s
    var = sumsq / s - jnp.square(mean)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return mean.reshape(shape), inv.reshape(shape)


def _use_packed_stats() -> bool:
    env = os.environ.get("MISEG_PACKED_STATS", "").strip().lower()
    if env:
        return env not in ("0", "false", "off")
    return False  # measured e2e — see _stats_packed docstring / BASELINE.md


def _stats_packed(x: Array, eps: float):
    """Instance-norm stats over a 128-lane-packed flat view (round-4
    layout experiment, VERDICT r3 #9).

    The big per-channel stat fusions crawl at 56–92 GB/s because the
    reduce emitter works lane-minor over C=48 of a 128-wide tile (2.67×
    padded traffic, multi-pass).  This variant pays ONE relayout copy —
    `[B, S, C] → [B, S·C/P, P]` with `P = lcm(C, 128)` — after which
    every lane is live: lane `l` of EVERY row holds channel `l % C`
    (P is a multiple of C), so per-channel sums are a full-bandwidth
    major-axis reduce to `[B, P]` followed by a tiny `[P, C]` indicator
    fold.  Numerically identical to `_stats` (f32 accumulation, same
    E[x²]−E[x]² variance).

    E2E verdict on v5e: see BASELINE.md round-4 "layout experiment" row
    (kill bar: < +5% e2e ⇒ default stays off).
    """
    b, c = x.shape[0], x.shape[-1]
    s = math.prod(x.shape[1:-1])
    pack = (128 * c) // math.gcd(c, 128)  # lcm(C, 128)
    xp = x.reshape(b, (s * c) // pack, pack)
    col = jnp.sum(xp, axis=1, dtype=jnp.float32)              # [B, P]
    colsq = jnp.sum(jnp.square(xp.astype(jnp.float32)), axis=1)
    fold = ((jnp.arange(pack) % c)[:, None] == jnp.arange(c)
            ).astype(jnp.float32)                             # [P, C]
    mean = (col @ fold) / s
    var = (colsq @ fold) / s - jnp.square(mean)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return mean.reshape(shape), inv.reshape(shape)


def _stats(x: Array, axes, eps: float):
    """Mean/inv-std over `axes` in float32."""
    axes_n = tuple(sorted(a % x.ndim for a in
                          (axes if isinstance(axes, (tuple, list)) else (axes,))))
    is_instance_axes = (axes_n == tuple(range(1, x.ndim - 1)) and x.ndim >= 4
                        and math.prod(x.shape[1:-1]) >= (1 << 15)
                        and x.shape[-1] <= 256)
    if is_instance_axes and _use_matmul_stats():
        return _stats_matmul(x, eps)
    if is_instance_axes and _use_packed_stats():
        c = x.shape[-1]
        pack = (128 * c) // math.gcd(c, 128)
        if pack <= 1024 and (math.prod(x.shape[1:-1]) * c) % pack == 0:
            return _stats_packed(x, eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    # TWO-PASS variance (E[(x-mean)²]), like torch: the one-pass
    # E[x²]-mean² form loses ~3 decimal digits to cancellation whenever
    # var << mean² — real conv activations hit this (measured: a swin
    # patch-embed channel with mean -0.27, var 7e-4 came out 7.3e-3
    # wrong vs f64, the dominant term in the round-5 swin parity race;
    # torch's two-pass is 1e-6 from f64 on the same data)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mean, inv


def instance_norm(x: Array, gamma: Array | None = None, beta: Array | None = None,
                  *, eps: float = 1e-5) -> Array:
    """Instance norm over spatial dims of `[B, *spatial, C]`.

    gamma/beta: `[C]` or None (parameter-free, the reference's
    `F.instance_norm` used by Swin `proj_out`, swin_transformer.py:135-136).
    """
    spatial_axes = tuple(range(1, x.ndim - 1))
    mean, inv = _stats(x, spatial_axes, eps)
    y = (x.astype(jnp.float32) - mean) * inv
    if gamma is not None:
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def conditional_instance_norm(x: Array, styles: Array, gamma: Array, beta: Array,
                              *, eps: float = 1e-5) -> Array:
    """Conditional (per-modality) instance norm.

    Args:
      x: `[B, *spatial, C]`.
      styles: `i32[B]` modality/style index per sample.
      gamma, beta: `[num_styles, C]` parameter banks.

    One gather + one vectorized instance norm — no per-sample Python loop
    (contrast conditional_instance_norm.py:59-60 in the reference).

    Out-of-range style ids clamp to the nearest bank (the data pipeline
    validates ids; under jit we cannot raise like the reference's
    `_check_input_styles`, conditional_instance_norm.py:40-47).
    """
    g = jnp.take(gamma, styles, axis=0, mode="clip")  # [B, C]
    b = jnp.take(beta, styles, axis=0, mode="clip")   # [B, C]
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    spatial_axes = tuple(range(1, x.ndim - 1))
    mean, inv = _stats(x, spatial_axes, eps)
    y = (x.astype(jnp.float32) - mean) * inv
    y = y * g.astype(jnp.float32).reshape(bshape) + b.astype(jnp.float32).reshape(bshape)
    return y.astype(x.dtype)


def layer_norm(x: Array, gamma: Array | None = None, beta: Array | None = None,
               *, eps: float = 1e-5) -> Array:
    """Layer norm over the trailing channel axis (elementwise affine over C)."""
    mean, inv = _stats(x, (-1,), eps)
    y = (x.astype(jnp.float32) - mean) * inv
    if gamma is not None:
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(x: Array, num_groups: int, gamma: Array | None = None,
               beta: Array | None = None, *, eps: float = 1e-5) -> Array:
    """Group norm over `[B, *spatial, C]` with C split into `num_groups`."""
    b, *spatial, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    xg = x.reshape(b, *spatial, num_groups, c // num_groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean, inv = _stats(xg, axes, eps)
    y = ((xg.astype(jnp.float32) - mean) * inv).reshape(x.shape)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_inference(x: Array, mean: Array, var: Array, gamma: Array | None,
                         beta: Array | None, *, eps: float = 1e-5) -> Array:
    """Batch norm with given running stats (`[C]` each)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * inv
    if gamma is not None:
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_stats(x: Array):
    """Per-channel batch mean/var over batch+spatial dims of `[B, *spatial, C]`."""
    axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def parse_normalization(norm_name: str, *, num_styles: int = 2, affine: bool = True,
                        num_groups: int = 8):
    """CLI string → (name, kwargs) norm spec.

    Mirrors the reference mapping (networks/norms/utils.py:1-16):
      instance_cond → {num_styles, affine}; instance/batch → {affine};
      layer → {elementwise_affine}; group → {affine, num_groups}.
    """
    if norm_name == "instance_cond":
        return (norm_name, {"num_styles": num_styles, "affine": affine})
    if norm_name in ("instance", "batch"):
        return (norm_name, {"affine": affine})
    if norm_name == "layer":
        return (norm_name, {"elementwise_affine": affine})
    if norm_name == "group":
        return (norm_name, {"affine": affine, "num_groups": num_groups})
    return (norm_name, {})
