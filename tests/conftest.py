"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests
run against 8 virtual CPU devices instead.  float64 is enabled so NumPy
oracles can be compared at tight tolerances (library code defaults to
float32 and is dtype-polymorphic).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is not honored;
# the config update below is what actually forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A single-process full-suite run accumulates hundreds of XLA:CPU
    compiled executables over its lifetime and has segfaulted inside
    ``backend_compile_and_load`` >60 min in (twice, different tests —
    a process-lifetime pathology, not a test bug).  Clearing the
    compilation caches at module teardown bounds that growth; jitted
    functions stay valid and simply recompile on next use.
    (``tests/run_suite.sh`` additionally chunks the suite across
    processes for runs under heavy load.)
    """
    yield
    jax.clear_caches()
