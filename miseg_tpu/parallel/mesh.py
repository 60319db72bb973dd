"""Device mesh + sharding utilities (the DDP/NCCL replacement).

The reference's only parallelism is data parallel: PTL DDP (train.py:47)
and manual torch DDP + DistributedSampler (tune.py:104-109,
data/multi_modal.py:283-323) over NCCL.  TPU-natively that whole stack
collapses to:
  * a `jax.sharding.Mesh` over all devices (1-D "data" axis by default;
    extra axes, e.g. ("data", "model"), are accepted for tensor-parallel
    experiments);
  * batches placed with a NamedSharding that shards dim 0 on "data";
  * params/opt-state replicated;
  * `jax.jit` compiles the gradient all-reduce onto ICI automatically —
    no NCCL analog, no explicit collectives in user code.

Multi-host: `jax.distributed.initialize()` (caller's responsibility),
then `host_shard_info()` gives the per-host shard for the DataLoader
(replaces DistributedSampler).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=(-1,), axis_names=("data",)) -> Mesh:
    """Create a device mesh; -1 infers that axis from the device count."""
    devices = np.array(jax.devices())
    shape = tuple(shape)
    n = devices.size
    if shape.count(-1) == 1:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape = tuple(n // known if s == -1 else s for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 across the data axis (batch parallelism)."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place each batch array with dim-0 sharded on the data axis.

    Single-host: device_put with a NamedSharding; non-divisible batches
    replicate (correct but unparallelized).  Multi-host: each process
    holds only its LOCAL loader shard, so the global array is assembled
    with `jax.make_array_from_process_local_data` — a plain device_put of
    differing per-host values under a replicated sharding would skip the
    gradient sync and silently diverge the replicas.
    """
    n = mesh.shape[axis]
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    multihost = jax.process_count() > 1

    def put(x):
        if multihost and x.ndim > 0:
            import numpy as np
            return jax.make_array_from_process_local_data(sharded,
                                                          np.asarray(x))
        ok = x.ndim > 0 and x.shape[0] % n == 0
        return jax.device_put(x, sharded if ok else replicated)

    return {k: put(v) if hasattr(v, "shape") else v for k, v in batch.items()}


def host_shard_info() -> tuple[int, int]:
    """(shard, num_shards) for the per-host DataLoader split."""
    return jax.process_index(), jax.process_count()
