"""Two-process distributed execution test (marked slow).

Spawns a local 2-process CPU cluster (4 virtual devices each → one
8-device mesh) and runs tests/_distributed_worker.py in both, covering the
multi-host paths the in-process suite cannot: `jax.distributed.initialize`
rendezvous, `shard_batch`'s `make_array_from_process_local_data` branch with
a cross-process jitted reduction, per-host loader sharding, and the
`MultiHostTrial` suggest/prune broadcast.  The reference's equivalent is its
Slurm-only NCCL path (tune.py:272-288 + TorchDistributedTrial, tune.py:81-82),
which cannot run without a cluster — this harness needs only localhost.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    nproc = 2
    port = _free_port()
    env = {**os.environ,
           "PYTHONPATH": REPO,  # drop the axon site hook: pure-CPU workers
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_distributed_worker.py"),
         str(pid), str(nproc), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    res = [json.load(open(tmp_path / f"result_{i}.json")) for i in range(nproc)]
    for i, r in enumerate(res):
        assert r["process_index"] == i
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["mesh_devices"] == 8
        assert r["global_batch_shape"] == [8, 1]

    # loader shards: equal step counts, disjoint items, full coverage
    # (10 items pad to 5+5 with one duplicate — DistributedSampler semantics)
    assert res[0]["loader_steps"] == res[1]["loader_steps"] == 5
    s0, s1 = set(res[0]["loader_indices"]), set(res[1]["loader_indices"])
    assert len(s0 & s1) <= 1  # only the pad item may repeat
    assert len(s0 | s1) == 10

    # cross-process reduction: the global batch is [0..3, 100..103];
    # grad of mean(x*w) wrt w = global mean = (6 + 406) / 8
    expect = (sum(range(4)) + sum(100 + i for i in range(4))) / 8.0
    for r in res:
        assert np.isclose(r["global_mean"], expect), r["global_mean"]
        assert np.isclose(r["grad"], expect), r["grad"]

    # MultiHostTrial: both hosts must hold identical suggested values
    assert res[0]["lr"] == res[1]["lr"]
    assert 1e-5 <= res[0]["lr"] <= 1e-3
    assert res[0]["heads"] == res[1]["heads"] and res[0]["heads"] in (2, 3, 4)
    assert res[0]["prune"] == res[1]["prune"] is False
