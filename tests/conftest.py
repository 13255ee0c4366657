"""Test configuration: run on a virtual 8-device CPU mesh.

Set platform/flags BEFORE jax initializes so multi-chip sharding logic is
testable without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: this host has a single CPU core and each
# distinct op/executable costs ~0.4s to compile, so caching across test runs
# is essential. Also: always jit top-level functions with arrays as ARGS
# (never closures) -- eager dispatch of a long op chain takes minutes here.
import jax  # noqa: E402

# the env var alone is overridden by this image's site hooks (axon plugin);
# the config update is authoritative
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
