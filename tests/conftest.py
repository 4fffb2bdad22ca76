"""Test config: force an 8-device virtual CPU mesh.

This is the multi-host "fake backend" the reference lacks (SURVEY §4):
sharding/collective tests run over 8 virtual CPU devices.

Note: a pytest plugin imports jax before this conftest runs, so env-var
routes (XLA_FLAGS / JAX_PLATFORM_NAME) are unreliable here; the runtime
config below works because jax initializes backends lazily.
"""

import os

import jax
import numpy as np
import pytest

jax.config.update("jax_platform_name", "cpu")     # not the axon TPU
jax.config.update("jax_num_cpu_devices", 8)       # virtual multi-chip mesh

# this sandbox's XLA:CPU compiles are slow (~1.5s per new shape); persist
# compiled executables so repeat test runs are fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
