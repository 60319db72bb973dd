"""Tensor parallelism (TP): Megatron-style sharding of the transformer
matmuls over a mesh "model" axis — as a placement decision, like
`fsdp.py`/`spatial.py`, with zero model-code changes.

The reference has no TP (its only parallelism is DDP, train.py:47;
SURVEY §2.8 lists TP as "not required for parity; optional mesh axis for
the 768-wide ViT").  TPU-natively GSPMD makes it a parameter-placement
rule: annotate each transformer matmul weight with the PartitionSpec its
role demands, run the SAME jitted train step, and XLA inserts the
collectives on ICI.  Roles (the classic Megatron pairing):

  * MLP `linear1` kernel `[C, M]`  — COLUMN-parallel `P(None, tp)`; its
    bias `[M]` shards too.  The `[.., M]`-sharded activation flows
    through the elementwise act into
  * MLP `linear2` kernel `[M, C]`  — ROW-parallel `P(tp, None)`: the
    contraction runs on local shards and GSPMD emits ONE all-reduce per
    MLP, exactly Megatron's f/g pattern.  Bias replicated (post-reduce).
  * attention `qkv` kernel `[C, 3C]` — ROW-parallel on the input dim
    (the `[.., 3, H, hd]` reshape's 3-major factor blocks clean
    column/head propagation when tp ∤ 3); the projection FLOPs shard,
    one all-reduce restores the replicated qkv activation.
  * attention `proj` kernel `[C, C]` — ROW-parallel; when the head count
    divides the axis, GSPMD's *backward* propagation head-shards the
    attention einsums feeding it for free.
  * swin `PatchMerging.reduction` `[8c, 2c]` — ROW-parallel.

Everything else — conv kernels, norm scales, the conditional-norm banks,
rel-pos bias tables — replicates under pure TP (the conv half of these
models is the DP/SP/FSDP domain; TP targets the transformer stacks of
ViT/UNETR/Swin).  Composes:
  * with DP on a 2-D ("data", "model") mesh — batch on "data";
  * with FSDP — pass `fsdp_axis`/`fsdp_min_size` and the leaves TP does
    not claim shard ZeRO-3-style instead of replicating.

Optimizer state (Adam moments, MultiSteps grad accumulators) mirrors the
param tree leaf-for-leaf, so each opt leaf inherits the spec of the param
whose path its own path ends with — the update stays fully sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .fsdp import leaf_spec as _fsdp_leaf_spec

# module name -> (kernel ndim, sharded kernel dim, bias sharded?)
# dims are for the flax Dense layout `[in, out]`.
_ROLES = {
    "linear1": ("col",),    # [C, M] -> P(None, tp), bias [M] -> P(tp)
    "linear2": ("row",),    # [M, C] -> P(tp, None), bias replicated
    "qkv": ("row",),        # [C, 3C] -> P(tp, None)
    "proj": ("row",),       # [C, C]  -> P(tp, None)
    "reduction": ("row",),  # PatchMerging [8c, 2c] -> P(tp, None)
}


def tp_leaf_spec(path_names: tuple[str, ...], shape, n: int,
                 axis: str) -> P | None:
    """Megatron spec for one param leaf, or None when TP does not claim it.

    Only rank-2 `kernel`s (flax Dense) and their `bias` under a module
    whose name carries a `_ROLES` role are claimed; the swin `PatchEmbed`
    conv is also named "proj" but its rank-5 kernel fails the rank gate.
    Sharded dims must divide the axis size, else the leaf is unclaimed.
    """
    if n <= 1 or len(path_names) < 2:
        return None
    leaf, module = path_names[-1], path_names[-2]
    role = _ROLES.get(module)
    if role is None:
        return None
    mode = role[0]
    if leaf == "kernel" and len(shape) == 2:
        dim = 1 if mode == "col" else 0
        if shape[dim] % n:
            return None
        spec = [None, None]
        spec[dim] = axis
        return P(*spec)
    if leaf == "bias" and len(shape) == 1 and mode == "col":
        return P(axis) if shape[0] % n == 0 else None
    return None


def _key_name(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def tp_param_shardings(params, mesh: Mesh, axis: str = "model",
                       fsdp_axis: str | None = None,
                       fsdp_min_size: int = 8192):
    """Pytree of NamedShardings for the param tree.

    Unclaimed leaves replicate, or ZeRO-3-shard on `fsdp_axis` when given
    (hybrid TP + FSDP).
    """
    n = int(mesh.shape[axis])
    n_fs = int(mesh.shape[fsdp_axis]) if fsdp_axis else 1

    def rule(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        names = tuple(_key_name(k) for k in path)
        spec = tp_leaf_spec(names, shape, n, axis)
        if spec is None:
            spec = (_fsdp_leaf_spec(shape, n_fs, fsdp_axis, fsdp_min_size)
                    if fsdp_axis else P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def tp_state_shardings(state, mesh: Mesh, axis: str = "model",
                       fsdp_axis: str | None = None,
                       fsdp_min_size: int = 8192):
    """Shardings for a full TrainState (params + opt_state + extras).

    Optimizer leaves (Adam mu/nu, MultiSteps accumulators) are matched to
    their param by PATH SUFFIX + shape: the opt tree nests a params-shaped
    subtree, so an opt leaf's path ends with the param's path.  Leaves
    with no suffix match follow the unclaimed rule (replicate / FSDP).
    """
    n_fs = int(mesh.shape[fsdp_axis]) if fsdp_axis else 1
    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    by_path = {}
    for path, leaf in flat:
        names = tuple(_key_name(k) for k in path)
        spec = tp_leaf_spec(names, tuple(leaf.shape), int(mesh.shape[axis]),
                            axis)
        if spec is not None:
            by_path[names] = (tuple(leaf.shape), spec)

    def rule(path, leaf):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        names = tuple(_key_name(k) for k in path)
        for start in range(len(names)):
            hit = by_path.get(names[start:])
            if hit is not None and hit[0] == tuple(shape):
                return NamedSharding(mesh, hit[1])
        spec = (_fsdp_leaf_spec(tuple(shape), n_fs, fsdp_axis, fsdp_min_size)
                if fsdp_axis else P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state_tp(state, mesh: Mesh, axis: str = "model",
                   fsdp_axis: str | None = None, fsdp_min_size: int = 8192):
    """Place an existing train state with TP (+optional FSDP) placements."""
    return jax.device_put(state, tp_state_shardings(
        state, mesh, axis, fsdp_axis, fsdp_min_size))
