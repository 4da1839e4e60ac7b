"""Test configuration: CPU backend with 8 virtual devices (the standard way
to test pjit/collectives without a pod) and float64 for numerical parity
with the reference's numpy implementation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# force CPU: some installs (axon plugin) ignore the JAX_PLATFORMS env var,
# only the config flag is honoured
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the jitted CP loop is expensive to build on the
# small CI CPU; cache it across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
