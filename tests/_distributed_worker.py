"""Worker for the two-process distributed test (tests/test_distributed_slow.py).

Launched as `python tests/_distributed_worker.py <pid> <nproc> <port> <outdir>`
with JAX_PLATFORMS=cpu and 4 virtual CPU devices per process.  Exercises the
multi-host code paths the single-process suite cannot reach:
  * `jax.distributed.initialize` over a local 2-process CPU cluster
    (gloo cross-process collectives) — the NCCL-rendezvous analog of the
    reference's Slurm path (tune.py:272-288);
  * `shard_batch`'s `jax.make_array_from_process_local_data` branch plus a
    jitted global reduction (the DDP gradient all-reduce equivalent);
  * per-host DataLoader sharding: disjoint index shards, equal step counts
    (DistributedSampler semantics, data/multi_modal.py:283-323);
  * `MultiHostTrial` host-0 suggest/prune broadcast
    (TorchDistributedTrial analog, tune.py:81-82).

Results are written to <outdir>/result_<pid>.json for the parent to assert.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from miseg_tpu.parallel import (host_shard_info, make_mesh,
                                    replicated_sharding, shard_batch)

    out: dict = {"process_index": jax.process_index(),
                 "process_count": jax.process_count(),
                 "local_devices": len(jax.local_devices()),
                 "global_devices": len(jax.devices())}

    # ---- per-host loader sharding (DistributedSampler semantics) ---------
    from miseg_tpu.data.dataset import DataLoader, Dataset

    items = [{"image": np.full((2, 2, 2, 1), i, np.float32), "modality": i % 2}
             for i in range(10)]
    shard, num_shards = host_shard_info()
    loader = DataLoader(Dataset(items), batch_size=1, shuffle=True, seed=3,
                        shard=shard, num_shards=num_shards)
    loader.set_epoch(0)
    seen = [int(b["image"][0, 0, 0, 0, 0]) for b in loader]
    out["loader_indices"] = seen
    out["loader_steps"] = len(loader)

    # ---- multi-host batch assembly + jitted global reduction -------------
    mesh = make_mesh()  # all 8 devices across both processes
    out["mesh_devices"] = int(mesh.devices.size)
    local_bs = 4  # per-process; global batch = 8
    local = np.arange(local_bs, dtype=np.float32).reshape(local_bs, 1) \
        + 100.0 * pid
    batch = shard_batch({"image": local}, mesh)
    g = batch["image"]
    out["global_batch_shape"] = list(g.shape)

    # replicated params + data-sharded batch: jit inserts the cross-process
    # all-reduce for the grad (the DDP equivalent)
    w = jax.device_put(jnp.ones((1,), jnp.float32), replicated_sharding(mesh))

    def loss(w, x):
        return jnp.mean(x * w)

    grad = jax.jit(jax.grad(loss))(w, g)
    out["grad"] = float(jax.device_get(grad)[0])
    out["global_mean"] = float(jax.device_get(
        jax.jit(lambda x: jnp.mean(x))(g)))

    # ---- MultiHostTrial broadcast (host-0 suggests; others receive) ------
    from miseg_tpu.cli.tune import MultiHostTrial
    from miseg_tpu.hpo import TPESampler, create_study

    if jax.process_index() == 0:
        study = create_study(study_name="dist", storage=None,
                             sampler=TPESampler(seed=11), direction="maximize")
        raw = study.ask()
    else:
        raw = None
    trial = MultiHostTrial(raw)
    out["lr"] = trial.suggest_float("lr", 1e-5, 1e-3, log=True)
    out["heads"] = trial.suggest_categorical("num_heads", [2, 3, 4])
    trial.report(0.5, 0)
    out["prune"] = trial.should_prune()

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
