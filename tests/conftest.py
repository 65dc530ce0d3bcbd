"""Test harness: force an 8-device virtual CPU mesh so sharding code is
exercised without TPU hardware (the standard JAX pod-slice test pattern).

Note: the environment's axon TPU plugin force-sets jax_platforms="axon,cpu"
from sitecustomize, so the env-var override alone is not enough — we must
update jax.config after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persist compiled executables across test runs (big win for re-runs).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
