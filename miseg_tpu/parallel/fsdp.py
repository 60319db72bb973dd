"""FSDP-style (ZeRO-3) parameter/optimizer sharding over the device mesh.

The reference's only parallelism is DDP — every rank holds a full replica
of params + Adam moments (train.py:47, tune.py:104-109).  TPU-natively,
GSPMD makes fully-sharded data parallelism a *placement decision*, not an
algorithm: annotate each large parameter leaf with a NamedSharding that
splits ONE of its axes across the mesh, hand those placements to the same
jitted train step, and XLA inserts the all-gather (params, fwd/bwd) and
reduce-scatter (grads) on ICI.  The step function, loss, and optimizer
code are untouched — this module only computes placements.

Design:
  * one rule per leaf, by shape alone: shard the LARGEST axis divisible
    by the mesh-axis size; leaves smaller than `min_size` elements (norm
    scales/biases, the conditional-norm banks) stay replicated — their
    all-gather latency would dominate any memory win;
  * the same rule is applied to the optimizer state, so Adam's mu/nu
    (which mirror the param tree leaf-for-leaf) shard identically and the
    optimizer update runs fully sharded with zero communication;
  * composes with batch sharding on the same axis ("data") for classic
    ZeRO-3, or a separate axis of a 2-D mesh for hybrid DP×FSDP.

Memory: a replicated C-Swin-UNETR fs=48 train state is ~62M params × 12
bytes (f32 master + 2 Adam moments) ≈ 745 MB per chip; fully sharded on
8 chips the per-chip share drops to ~93 MB + the transient all-gathered
layer weights.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_spec(shape, n: int, axis: str, min_size: int = 8192) -> P:
    """PartitionSpec for one leaf: largest dim divisible by `n`, else
    replicated.  Ties prefer the LAST qualifying dim (channel-most for
    our channel-last conv kernels, so the all-gather is lane-contiguous).
    """
    if n <= 1 or not shape or int(np.prod(shape)) < min_size:
        return P()
    best = -1
    for d, s in enumerate(shape):
        if s % n == 0 and (best < 0 or s >= shape[best]):
            best = d
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def tree_shardings(tree, mesh: Mesh, axis: str = "data",
                   min_size: int = 8192):
    """Matching pytree of NamedShardings for params / opt_state / full
    TrainState.  Non-array leaves (step counters, schedules) replicate."""
    n = int(mesh.shape[axis])

    def rule(leaf):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, leaf_spec(tuple(shape), n, axis, min_size))

    return jax.tree.map(rule, tree)


def shard_state(state, mesh: Mesh, axis: str = "data", min_size: int = 8192):
    """Place an existing (host/replicated) train state fully sharded.

    For models too large to materialize replicated, jit the init with
    `out_shardings=tree_shardings(jax.eval_shape(init, ...), ...)` instead;
    at MI-Seg scale (≤62M params) re-placing is simpler and instant.
    """
    return jax.device_put(state, tree_shardings(state, mesh, axis, min_size))


def sharded_fraction(tree) -> float:
    """Fraction of tree elements whose placement is actually split (for
    tests/telemetry): 0.0 = fully replicated, →1.0 = fully sharded."""
    total, sharded = 0, 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "sharding"):
            continue
        total += leaf.size
        if not leaf.sharding.is_fully_replicated:
            sharded += leaf.size
    return sharded / max(total, 1)
