"""Test config: force an 8-device virtual CPU platform BEFORE jax initializes.

This is the TPU answer to "test multi-device without a cluster"
(SURVEY.md §4): every sharding/collective test runs on 8 virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter startup (before this
# conftest), capturing JAX_PLATFORMS from the env — override via config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: CPU-mesh compiles of the full models take minutes;
# cache them across test processes
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
