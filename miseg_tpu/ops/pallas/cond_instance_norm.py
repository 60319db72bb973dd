"""Fused conditional instance norm — kept as the round-1 public API.

The native-kernel analog of apex's `InstanceNorm3dNVFuser` that the
reference exposes via its `instance_nvfuser` factory
(networks/layers/factories.py:74,261-295), specialized to the conditional
(per-modality parameter bank) case that is MI-Seg's scientific core.

Round 2 superseded the original two-pass `[B, N, C]` kernel with the
merged lane-dense implementation in `fused_norm.py` (same semantics,
dense-lane HBM blocks, fused residual/activation, shared backward); this
wrapper delegates so there is exactly ONE kernel + VJP to maintain.
"""

from __future__ import annotations

import jax

from .fused_norm import fused_instance_norm_act, merge_view

Array = jax.Array


def fused_conditional_instance_norm(x: Array, styles: Array, gamma: Array,
                                    beta: Array, *, eps: float = 1e-5,
                                    negative_slope: float | None = None,
                                    interpret: bool | None = None) -> Array:
    """Pallas-fused conditional instance norm over `[B, *spatial, C]`.

    `gamma`/`beta`: `[num_styles, C]` banks gathered by `styles: i32[B]`;
    `negative_slope` fuses a trailing leaky-relu.  Delegates to
    `fused_norm.fused_instance_norm_act` (the lane-dense merged kernel).
    """
    if merge_view(x.shape) is None:
        raise ValueError(f"no lane-dense merge for {x.shape}")
    return fused_instance_norm_act(x, gamma, beta, styles, eps=eps,
                                   negative_slope=negative_slope,
                                   interpret=interpret)
