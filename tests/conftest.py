"""Test configuration: force the CPU backend with 8 virtual devices so that
sharding/collective tests run without TPU hardware. Must run before any jax
import in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# The axon sitecustomize force-selects the TPU platform via jax.config, which
# wins over the env var — override it back to CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated CPU compiles are identical across
# test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/raynet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
