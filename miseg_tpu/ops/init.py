"""Parameter initializers (truncated normal etc.) used across the models.

Covers the reference's `trunc_normal_` usage (patch_embedding.py:89-106,
window_attention rel-pos tables) via flax-compatible initializer callables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def trunc_normal(stddev: float = 0.02, mean: float = 0.0, lower: float = -2.0,
                 upper: float = 2.0):
    """Truncated-normal initializer (truncation in units of stddev)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.truncated_normal(key, lower, upper, shape, jnp.float32)
        return (u * stddev + mean).astype(dtype)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
