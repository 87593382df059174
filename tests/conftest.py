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


# Modules that compile large-dim programs (30B/65B shapes, sharded engines):
# their executables + constants are what blow up the process footprint.
_HEAVY_MODULES = {
    "test_large_configs", "test_scheduler_mesh", "test_sharding",
    "test_sharded_session", "test_engine", "test_scheduler",
    "test_perplexity_gate",
}


@pytest.fixture(autouse=True, scope="module")
def _bound_process_memory(request):
    """Drop compiled executables + cached constants after heavy modules.

    The suite runs ~150 tests in ONE process, several of which compile
    30B/65B-dim sharded programs; without trimming, the jit caches
    accumulate until XLA's host allocator aborts mid-suite (observed as a
    SIGABRT in a device->host transfer around the 140th test). Clearing
    after EVERY module ballooned the suite from ~7 to ~18 min in
    recompiles of the shared small kernels, so only the heavy modules
    clear."""
    yield
    if request.module.__name__ in _HEAVY_MODULES:
        jax.clear_caches()
        gc.collect()
