"""Test configuration: run on CPU with 8 virtual devices so multi-chip sharding
paths can be exercised without TPU hardware (SURVEY.md section 7 / build brief)."""

import os

# Force CPU even when the environment pre-sets JAX_PLATFORMS (e.g. axon TPU tunnel):
# unit tests must run locally; the TPU path is exercised by bench.py / examples.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and overrides
# JAX_PLATFORMS; an explicit config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite re-traces many identical programs
# across test files; caching compiled executables across runs (and across tests
# in one run) cuts wall time substantially.
jax.config.update("jax_compilation_cache_dir", "/tmp/smoqy_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
