"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on virtual CPU devices (the reference's analog is the ``ddp_sim``
CPU-spawn trainer profile, ``configs/trainer/ddp_sim.yaml``).
"""

import os

# The container's sitecustomize force-registers the remote TPU ("axon")
# backend at interpreter startup (it imports jax before any conftest runs).
# JAX backends initialize lazily, so overriding the platform + device count
# here -- before the first device query -- still takes effect.  Tests run on
# a local 8-virtual-device CPU mesh; set EVI_TESTS_ON_TPU=1 to opt out.
if os.environ.get("EVI_TESTS_ON_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: this host has one CPU core and XLA compiles
# are the dominant test cost; cache them across runs.
import jax as _jax  # noqa: E402

_jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
