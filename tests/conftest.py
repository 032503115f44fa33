"""Test harness config: force CPU with 8 virtual devices.

Mirrors SURVEY.md section 5 (race detection row): multi-device code is
exercised on an XLA-simulated 8-device host mesh; real-TPU execution is
covered by bench.py and the driver's compile checks.

Note: this environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS to the TPU plugin, so plain env-var overrides are too late
here -- we must go through jax.config before any backend is initialized.
"""

import os

# XLA_FLAGS is read lazily at CPU-client creation, so this still applies.
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: CPU test compiles dominate suite wall-clock;
# reruns with unchanged programs load from cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
