"""Test configuration: run hermetically on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: the execution environment may pre-import jax (sitecustomize) with
``JAX_PLATFORMS=axon``, so plain env vars are too late — use
``jax.config.update`` before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(42)
    yield
