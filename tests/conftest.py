"""Test configuration: run on a virtual 8-device CPU mesh.

Set platform/flags BEFORE jax initializes so multi-chip sharding logic is
testable without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
