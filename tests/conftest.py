"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated single-process over virtual CPU
devices — the standard JAX substitute for a real pod slice (SURVEY.md §4).
Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
