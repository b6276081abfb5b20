"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on virtual CPU devices (the reference's analog is the ``ddp_sim``
CPU-spawn trainer profile, ``configs/trainer/ddp_sim.yaml``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: this host has one CPU core and XLA compiles
# are the dominant test cost; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
