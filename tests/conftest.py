"""Test configuration: force the CPU backend with 8 virtual devices.

Tests run on host CPU (fast, no TPU contention) with an 8-device virtual
mesh so multi-chip sharding logic is exercised without hardware — the
TPU-native analogue of a fake communicator backend (SURVEY.md §4).

Note: in this environment the axon TPU plugin ignores the ``JAX_PLATFORMS``
env var, so we force the platform via ``jax.config`` (must happen before any
backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Single-CPU sandbox: persistent compilation cache makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax-cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
