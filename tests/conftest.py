"""Test configuration: run everything on CPU with 8 virtual devices.

This is the multi-chip analog harness — sharding/pjit tests exercise real
`jax.sharding.Mesh` semantics on a virtual 8-device CPU topology (the
driver separately dry-run-compiles the multi-chip path).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miseg_tpu.utils.platform import force_cpu_devices

force_cpu_devices(8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
