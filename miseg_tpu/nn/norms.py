"""Flax normalization modules with optional modality conditioning.

One `Norm` module covers the reference's whole norm surface:
  * `instance_cond` — `_ConditionalInstanceNorm{1,2,3}d` parity
    (networks/norms/conditional_instance_norm.py): `num_styles` affine banks
    selected per-sample by `modalities`; here a `[num_styles, C]` gather +
    one vectorized instance norm.
  * `instance`, `layer`, `group`, `batch` — the `parse_normalization`
    options (networks/norms/utils.py:1-16).

All modules are rank-agnostic (channel-last `[B, *spatial, C]`), so the
1d/2d/3d class triplication of the reference collapses into one module.
Like the reference, `instance_cond` with `affine=False` is meaningless and
treated as affine (conditional_instance_norm.py:24-25 warns and ignores).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import norms as N


class Norm(nn.Module):
    """Unified norm layer. `kind` selects semantics; `features` is C."""

    kind: str
    features: int
    num_styles: int = 2
    affine: bool = True
    num_groups: int = 8
    eps: float = 1e-5
    momentum: float = 0.9  # batch-norm running-stat decay

    @nn.compact
    def __call__(self, x, modalities=None, *, train: bool = False,
                 act_slope: float | None = None, add=None):
        """`act_slope`/`add` fuse a trailing `y (+ add) -> leaky_relu` into
        the norm (instance/instance_cond only — the dynunet block tails,
        dynunet_block.py:104-125); other kinds reject them."""
        c = self.features
        if x.shape[-1] != c:
            raise ValueError(f"Norm expected {c} channels, got {x.shape[-1]}")
        kind = self.kind

        def _tail(y):
            if add is not None:
                y = y + add
            if act_slope is not None:
                y = jnp.where(y >= 0, y, jnp.asarray(act_slope, y.dtype) * y)
            return y

        if kind == "instance_cond":
            if modalities is None:
                raise ValueError("instance_cond norm requires a `modalities` vector")
            gamma = self.param("scale", nn.initializers.ones, (self.num_styles, c))
            beta = self.param("bias", nn.initializers.zeros, (self.num_styles, c))
            from ..ops.dispatch import use_pallas_norm
            if use_pallas_norm() and x.ndim >= 3:
                from ..ops.pallas import fused_norm
                if fused_norm.supported(x.shape):
                    return fused_norm.fused_instance_norm_act(
                        x, gamma, beta, modalities, eps=self.eps,
                        negative_slope=act_slope, add=add)
            return _tail(N.conditional_instance_norm(x, modalities, gamma,
                                                     beta, eps=self.eps))
        gamma = beta = None
        if self.affine:
            gamma = self.param("scale", nn.initializers.ones, (c,))
            beta = self.param("bias", nn.initializers.zeros, (c,))
        if kind == "instance":
            from ..ops.dispatch import use_pallas_norm
            if use_pallas_norm() and x.ndim >= 3:
                from ..ops.pallas import fused_norm
                if fused_norm.supported(x.shape):
                    return fused_norm.fused_instance_norm_act(
                        x, gamma, beta, eps=self.eps,
                        negative_slope=act_slope, add=add)
            return _tail(N.instance_norm(x, gamma, beta, eps=self.eps))
        if kind == "layer":
            return _tail(N.layer_norm(x, gamma, beta, eps=self.eps))
        if kind == "group":
            return _tail(N.group_norm(x, self.num_groups, gamma, beta, eps=self.eps))
        if kind == "batch":
            ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
            if train:
                mean, var = N.batch_stats(x)
                if not self.is_initializing():
                    m = self.momentum
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
            else:
                mean, var = ra_mean.value, ra_var.value
            return _tail(N.batch_norm_inference(x, mean, var, gamma, beta, eps=self.eps))
        raise ValueError(f"unknown norm kind: {kind!r}")


def make_norm(spec: tuple[str, dict[str, Any]] | str | None, features: int,
              name: str | None = None) -> Norm | None:
    """Instantiate a `Norm` from a `(name, kwargs)` spec (or bare name)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        spec = (spec, {})
    kind, kwargs = spec
    kw = dict(kwargs)
    affine = kw.pop("affine", kw.pop("elementwise_affine", True))
    return Norm(
        kind=kind,
        features=features,
        num_styles=kw.pop("num_styles", 2),
        affine=affine,
        num_groups=kw.pop("num_groups", 8),
        eps=kw.pop("eps", 1e-5),
        name=name,
    )
