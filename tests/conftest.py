"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

All tests run on CPU with 8 virtual devices so multi-chip sharding
(dove_tpu/parallel) is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite runs tiny shapes on 1 CPU core: compile time dominates and
# runtime is noise, so skip the backend optimization passes (measured 2.7x
# faster cold compiles on the heaviest e2e test; semantics-preserving —
# both sides of every equality assertion compile at the same level). Opt
# out with DOVE_TEST_FULL_XLA_OPT=1 (e.g. when debugging an XLA miscompile
# suspicion).
if (
    "xla_backend_optimization_level" not in flags
    and not os.environ.get("DOVE_TEST_FULL_XLA_OPT")
):
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import pytest  # noqa: E402

# A site plugin may register an accelerator backend and force
# jax_platforms to it after env vars are read; re-force CPU so tests are
# deterministic, fast, and run fp32 matmuls (bit-exactness assertions).
jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated on this 1-core host: every DovePipeline /
# Trainer instance re-jits the same tiny-config programs. The persistent
# compilation cache dedupes identical programs across tests AND across
# runs (a warm second run is several times faster). Opt out with
# DOVE_TEST_NO_COMPILE_CACHE=1 (e.g. when debugging XLA itself).
if not os.environ.get("DOVE_TEST_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "DOVE_TEST_COMPILE_CACHE_DIR", "/tmp/dove_jax_test_cache"
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # Subprocess-driving tests (CLI tools, multihost) spawn fresh Python
    # processes that can't see in-process config — export the same cache
    # through the env vars jax reads at startup so they share it too.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
