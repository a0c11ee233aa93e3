"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding behavior is validated
on a virtual CPU mesh exactly as the driver's dryrun does. The environment
pins JAX_PLATFORMS=axon via sitecustomize, so the env var alone is not
enough — we override through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# DBCSR_TEST_PLATFORM=tpu runs the suite against the real chip (slow:
# remote compiles); default is the virtual 8-device CPU mesh
jax.config.update(
    "jax_platforms", os.environ.get("DBCSR_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
