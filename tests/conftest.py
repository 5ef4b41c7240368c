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
