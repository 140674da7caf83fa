"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU plugin
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — we
must also update the config after importing jax (before any backend
initialization)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: model-sized CPU compiles take minutes;
# cache them across pytest processes
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, not the TPU tunnel")
    assert jax.device_count() == 8
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
