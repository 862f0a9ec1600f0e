"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

All tests run on CPU with 8 virtual devices so multi-chip sharding
(dove_tpu/parallel) is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# A site plugin may register an accelerator backend and force
# jax_platforms to it after env vars are read; re-force CPU so tests are
# deterministic, fast, and run fp32 matmuls (bit-exactness assertions).
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
