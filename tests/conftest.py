"""Test configuration: force CPU with 8 virtual devices.

Tests run on the host CPU backend (fast, no TPU contention) with an 8-device
virtual mesh so multi-chip sharding logic is exercised without hardware —
the TPU-native analogue of a fake communicator backend (SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
