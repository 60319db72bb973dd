"""Stochastic regularization ops: DropPath (stochastic depth), dropout helpers.

Reference parity: MONAI `DropPath` as used by Swin blocks
(swin_transformer_block.py) — per-sample residual-branch drop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(x: jax.Array, rate: float, rng: jax.Array | None, deterministic: bool) -> jax.Array:
    """Drop the whole residual branch per sample with probability `rate`."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
