"""Spatial partitioning (SP): shard the PATCH, not the batch.

The reference scales only by batch (DDP, train.py:47) — its patch size is
capped by one GPU's memory, which is why its recipe trains 96³ crops of
MM-WHS volumes (lightning_monai.py:86-93 tiles the rest back at inference).
On TPU, GSPMD makes the orthogonal axis available: shard a spatial dim of
the training patch across a mesh axis and the SAME jitted train step runs
with every activation split n-ways — XLA inserts halo exchanges around
convolutions, all-reduces for the instance-norm spatial statistics, and
collective permutes for the swin shifted-window rolls, all on ICI.  This
is the 3-D-volume analog of sequence/context parallelism (SURVEY §5
"long-context equivalents"): batch=1 patches larger than one chip's HBM
(192³+) become trainable with zero model-code changes.

Design:
  * shard dim 1 (D of channel-last `[B, D, H, W, C]`): the minor-most
    dims (W, C) carry the TPU (8,128) tiling and the lane-vectorized
    loads — splitting them would fragment tiles; D is layout-neutral.
  * inputs are PLACED sharded (`shard_spatial_batch`); propagation does
    the rest.  No with_sharding_constraint calls in model code.
  * composes with DP on a 2-D ("data", "sp") mesh: batch dim on "data",
    D on "sp" — and with FSDP by pointing `fsdp_axis` at either.
  * a spatial dim not divisible by the axis size falls back to
    replicated for that array (correct, just unparallelized) — same
    policy as `shard_batch`'s batch-dim rule.

Sliding-window inference keeps its window fan-out (inferers.py:220-244)
instead: at eval there are many independent 96³ windows, so whole-window
parallelism needs no halo traffic; SP is the train-time axis where the
patch is the only parallel unit available.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_DIM = 1  # D of [B, D, H, W, C] / [B, D, H, W] — see module doc


def spatial_spec(ndim: int, data_axis: str | None,
                 spatial_axis: str) -> P:
    """PartitionSpec for an image-like array: batch dim on `data_axis`
    (if given), dim 1 on `spatial_axis`, rest replicated."""
    spec = [None] * ndim
    if ndim > 0 and data_axis is not None:
        spec[0] = data_axis
    if ndim > SPATIAL_DIM + 1:  # rank >= 3: has true spatial extent
        spec[SPATIAL_DIM] = spatial_axis
    return _canon(spec)


def _canon(spec: list) -> P:
    """P with trailing Nones stripped (PartitionSpec equality is literal:
    P('x', None) != P('x'))."""
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def shard_spatial_batch(batch: dict, mesh: Mesh,
                        spatial_axis: str = "sp",
                        data_axis: str | None = "data") -> dict:
    """Place a batch dict with image/label spatially sharded.

    Volumetric arrays (rank >= 3: image `[B,D,H,W,C]`, label `[B,D,H,W]`)
    get dim 1 split on `spatial_axis` and dim 0 on `data_axis` when the
    mesh has it and the batch divides; low-rank arrays (modality `[B]`)
    follow the batch rule alone.  Divisibility failures degrade to
    replication per-dim, never error.
    """
    axes = dict(mesh.shape)
    n_sp = axes.get(spatial_axis, 1)
    n_dp = axes.get(data_axis, 1) if data_axis else 1

    def put(x):
        ndim = getattr(x, "ndim", 0)
        if ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        da = data_axis if (n_dp > 1 and x.shape[0] % n_dp == 0) else None
        sa = spatial_axis if (n_sp > 1 and ndim > SPATIAL_DIM + 1
                              and x.shape[SPATIAL_DIM] % n_sp == 0) else None
        spec = [None] * ndim
        spec[0] = da
        if sa is not None:
            spec[SPATIAL_DIM] = sa
        return jax.device_put(x, NamedSharding(mesh, _canon(spec)))

    return {k: put(v) if hasattr(v, "shape") else v
            for k, v in batch.items()}
