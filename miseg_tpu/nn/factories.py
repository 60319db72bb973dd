"""Name → constructor registries for activations and norm specs.

The reference carries a full `LayerFactory` fork of MONAI
(networks/layers/factories.py) to register `Norm["instance_cond", dim]`
plus Act/Conv/Pool/Pad/Dropout registries; in a functional JAX design the
conv/pool/pad factories collapse into `flax.linen` calls, so only the two
registries with real configuration surface remain: activations and norms.

`instance_nvfuser` (apex fused CUDA instance norm, factories.py:74,261-295)
maps to our fused Pallas conditional-instance-norm kernel
(miseg_tpu/ops/pallas/) and is accepted as an alias of `instance`.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import parse_normalization

_ACTS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    # exact erf form: torch nn.GELU defaults to approximate='none'
    # (reference networks/layers/factories.py:305), while jax.nn.gelu
    # defaults to the tanh approximation — a systematic ~3e-3 divergence
    # at |x|≈2 that the swin convergence-parity race surfaced (round 5)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
}


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch PReLU default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", nn.initializers.constant(self.init_slope), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def get_act(spec: str | tuple[str, dict[str, Any]] | None, module_name: str | None = None):
    """Return an activation callable (or flax module for parametric acts)."""
    if spec is None:
        return lambda x: x
    if isinstance(spec, str):
        name, kwargs = spec, {}
    else:
        name, kwargs = spec
    name = name.lower()
    if name == "prelu":
        return PReLU(init_slope=kwargs.get("init", 0.25), name=module_name)
    if name == "leakyrelu" and kwargs:
        slope = kwargs.get("negative_slope", 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(f"unknown activation: {name!r}") from None


def leaky_slope(spec: str | tuple[str, dict[str, Any]] | None) -> float | None:
    """negative_slope if `spec` is a leaky-relu with slope > 0, else None —
    used to fuse the activation into the preceding norm kernel.

    slope <= 0 is rejected (falls back to the unfused activation): the
    fused backward recovers the activation gate from sign(y), which is
    ambiguous at slope == 0 (negative pre-activations give y == 0 and
    would wrongly pass gradient through)."""
    if spec is None:
        return None
    name, kwargs = (spec, {}) if isinstance(spec, str) else spec
    if name.lower() != "leakyrelu":
        return None
    slope = float(kwargs.get("negative_slope", 0.01))
    return slope if slope > 0.0 else None


def get_norm_spec(norm_name: str | None, **kwargs) -> tuple[str, dict[str, Any]] | None:
    """CLI norm name → (kind, kwargs) spec; `instance_nvfuser` ⇒ `instance`."""
    if norm_name is None:
        return None
    if norm_name == "instance_nvfuser":
        norm_name = "instance"
    return parse_normalization(norm_name, **kwargs)
