"""Simple structural layers: skip connections and gradient reversal.

Reference parity:
  * `SkipConnection` (networks/layers/simplelayers.py:8-41) — runs a
    submodule and combines with the input via cat/add/mul, threading
    `modalities` into the submodule;
  * `GradientReversal` (networks/layers/gradient_reversal/) — identity
    forward, `-alpha`-scaled gradient backward (DANN adversarial head).

`SequentialWIthModalities` (simplelayers.py:44-48) needs no counterpart:
flax compact modules thread `modalities` explicitly.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class SkipConnection(nn.Module):
    """y = combine(x, submodule(x, modalities)) with combine ∈ {cat, add, mul}."""

    submodule: nn.Module
    mode: str = "cat"

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False):
        y = self.submodule(x, modalities, train=train)
        if self.mode == "cat":
            return jnp.concatenate([x, y], axis=-1)
        if self.mode == "add":
            return x + y
        if self.mode == "mul":
            return x * y
        raise NotImplementedError(f"unsupported skip mode {self.mode!r}")


@jax.custom_vjp
def gradient_reversal(x: jax.Array, alpha: float) -> jax.Array:
    """Identity forward; gradient scaled by -alpha on the way back."""
    return x


def _gr_fwd(x, alpha):
    return x, alpha


def _gr_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)


class GradientReversal(nn.Module):
    alpha: float = 1.0

    def __call__(self, x):
        return gradient_reversal(x, self.alpha)
