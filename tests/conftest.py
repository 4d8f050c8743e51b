"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU regardless of the ambient platform. The environment may preset
# JAX_PLATFORMS=axon/tpu and a sitecustomize may import jax before conftest
# runs, so setting the env var is not enough — use jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
