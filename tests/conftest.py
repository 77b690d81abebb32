"""Test config: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-backend trick (SURVEY.md §4): multi-chip
sharding logic is validated on host CPU without TPU pods.
"""
import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the driver environment
# pre-sets a TPU platform; unit tests must be deterministic f32 CPU).
if os.environ.get("PWW_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("PWW_TEST_TPU") != "1":
    # The environment's sitecustomize force-selects the TPU backend via
    # jax.config (overriding JAX_PLATFORMS); undo it for unit tests.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_state():
    """Full-suite runs (~300 tests, hundreds of XLA:CPU compiles in one
    process) have intermittently segfaulted inside LLVM late in the run;
    every module passes in isolation. Dropping the accumulated executables
    between modules bounds the compiler-state growth. Costs some shared
    tiny-program recompiles per module — correctness over wall time."""
    yield
    jax.clear_caches()
