"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding paths (jax.sharding.Mesh over 8 devices) are exercised
without TPU hardware.  Must run before jax initializes."""

import os

# Force-override: the session env may preset JAX_PLATFORMS=axon (the real
# TPU tunnel), where eager op-by-op dispatch pays a network round trip per
# primitive. Tests must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon plugin force-sets jax_platforms="axon,cpu" at import, IGNORING the
# env var: processes silently race for the single TPU chip and whoever gets
# it runs there (a 22MB+ program then OOMs the remote compile helper).  The
# config update below is the only reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# Long pytest runs accumulate every compiled XLA executable in-process
# (~20 GB by the tail of the suite on a fresh cache), which has produced
# XLA:CPU segfaults during LATER compilations.  Dropping JAX's in-memory
# caches between modules bounds the footprint; recompiles hit the on-disk
# persistent cache.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
