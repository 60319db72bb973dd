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

import jax
import jax.numpy as jnp

Array = jax.Array


def _stats(x: Array, axes, eps: float):
    """Mean/inv-std over `axes` in float32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=axes, keepdims=True) - jnp.square(mean)
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
