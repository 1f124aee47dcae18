"""Test harness config: run everything on CPU with 8 virtual devices so
batching/sharding tests need no TPU (SURVEY.md §4 "Multi-device without a
cluster").

IMPORTANT (this image): the ``JAX_PLATFORMS`` env var is NOT honored when
the axon TPU plugin is present — arrays silently land on the TPU and
device->host fetches over the tunnel stall for minutes.  Force the platform
through ``jax.config`` *before* the first backend use instead.
"""

import os

# keep the env vars too (harmless, and helps subprocesses)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: successive pytest runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/root/repo/.tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
