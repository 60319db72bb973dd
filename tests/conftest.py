"""Test configuration: run everything on CPU with 8 virtual devices.

This is the multi-chip analog harness — sharding/pjit tests exercise real
`jax.sharding.Mesh` semantics on a virtual 8-device CPU topology (the
driver separately dry-run-compiles the multi-chip path).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miseg_tpu.utils.platform import enable_compile_cache, force_cpu_devices

force_cpu_devices(8)
# Persistent, machine-fingerprinted XLA compile cache: the quick suite is
# compile-dominated (multi-minute swin/UNETR train-step compiles on this
# 1-core host), and every test jits the same programs run to run.  Cold
# runs pay full compile once; warm runs replay.  MISEG_NO_COMPILE_CACHE=1
# opts out (see utils/platform.py for the AOT-replay safety salting).
enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
