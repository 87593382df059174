"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated single-process over virtual CPU
devices — the standard JAX substitute for a real pod slice (SURVEY.md §4).

NOTE: the axon TPU-tunnel plugin in this image re-exports
JAX_PLATFORMS=axon during `import jax`, silently overriding the env var —
the config API below is the only reliable way to pin the CPU backend.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import gc

import jax
import pytest

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _bound_process_memory():
    """Drop compiled executables + cached constants between test modules.

    The suite runs ~150 tests in ONE process, several of which compile
    30B/65B-dim sharded programs; without trimming, the jit caches
    accumulate until XLA's host allocator aborts mid-suite (observed as a
    SIGABRT in a device->host transfer around the 140th test). Per-module
    recompiles of the small shared kernels cost a few seconds total."""
    yield
    jax.clear_caches()
    gc.collect()
