"""Shared example bootstrap: force local CPU devices (the session may point
JAX at a remote TPU tunnel where eager dispatch is an RPC per op) and enable
the persistent compile cache."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
os.environ["JAX_PLATFORMS"] = os.environ.get("EXAMPLE_PLATFORM", "cpu")
import jax  # noqa: E402

# the TPU-tunnel plugin overrides jax_platforms at import; force via config
jax.config.update("jax_platforms",
                  os.environ.get("EXAMPLE_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
