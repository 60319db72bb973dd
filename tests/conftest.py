"""Test configuration: run everything on CPU with 8 virtual devices.

This is the multi-chip analog harness — sharding/pjit tests exercise real
`jax.sharding.Mesh` semantics on a virtual 8-device CPU topology (the
driver separately dry-run-compiles the multi-chip path).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
