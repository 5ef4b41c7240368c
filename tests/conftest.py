"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware (SURVEY.md §4.3).
Must run before anything imports jax."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# this container's env pins JAX_PLATFORMS=axon (real TPU tunnel) and the axon
# plugin prepends itself to jax_platforms; the config update is the only way
# to actually force the CPU backend here.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_accumulation():
    """Clear JAX's compiled-executable caches at every module boundary.

    The full 140-test suite in ONE process deterministically segfaulted the
    XLA:CPU compiler near the end (r5, 3/3 runs: test_bfs fails, then the
    next fresh compile dies inside ``backend_compile_and_load``; one run's
    kernel log showed ~508 GB allocation requests — corrupted compiler
    state).  Any ~60-test subset is green, including the exact crashing
    tests standalone, so the trigger is TOTAL accumulated compiled programs
    in the process, not any specific test.  Clearing at module boundaries
    bounds the live-executable count; session-scoped jitted callables
    (e.g. the memoized SPMD programs) transparently recompile on next use."""
    yield
    jax.clear_caches()
