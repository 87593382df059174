"""Cross-host orchestration: running the framework over DCN (multi-host).

The reference has no distributed story at all (SURVEY §2.3 names this a
first-class new build). The TPU-native design is JAX's standard
multi-controller SPMD model:

  * every host process runs the SAME program and issues the SAME sequence
    of jit calls over one global Mesh;
  * the mesh is built hybrid — the data axis spans hosts over DCN
    (outermost, so each host's slots are contiguous), tensor parallelism
    stays inside a host's ICI domain where the per-layer psums are cheap;
  * everything a host *reads back* is replicated by construction: the
    BatchEngine's decode step all-gathers the sampled token ids (a [B]
    int32 — trivial bytes) across the data axis, so all hosts see all
    tokens, make identical stop/admit decisions, and never touch a
    non-addressable shard. Weights/KV/activations never cross DCN outside
    that gather.

Usage on an N-host slice:

    from fastllama_tpu.parallel import multihost
    multihost.initialize()                  # TPU pods: auto-discovery
    mesh = multihost.hybrid_mesh(dp=N * dp_local, tp=tp)
    eng = BatchEngine(..., rcfg=RuntimeConfig(mesh_shape=(N*dp_local, tp)))
    # every host submits the identical request list:
    eng.run(requests)

Single-process (including the 8-device virtual CPU mesh) degenerates to the
plain make_mesh path, so all of this is exercised by the regular test suite
except the DCN transport itself.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from .sharding import DATA_AXIS, MODEL_AXIS, make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               initialization_timeout: int | None = None) -> None:
    """Bring up the JAX distributed runtime (no-op if already up or single
    process). On Cloud TPU pods all three arguments are auto-discovered.

    IMPORTANT: the already-initialized guard must not touch the XLA backend
    — `jax.process_count()` initializes it, after which
    `jax.distributed.initialize` always raises "must be called before any
    JAX calls". `jax.distributed.is_initialized()` inspects only the
    distributed client state."""
    if jax.distributed.is_initialized():
        return  # already initialized
    kw = {}
    if initialization_timeout is not None:
        kw["initialization_timeout"] = initialization_timeout
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
    except (RuntimeError, ValueError) as e:
        # Tolerable ONLY when no multi-process run was requested (tests,
        # one-VM). A pod job that silently degrades to single-process would
        # compute a different mesh on every host — fail loudly instead.
        if num_processes is not None and num_processes > 1:
            raise
        import warnings
        warnings.warn(f"jax.distributed.initialize failed ({e!r}); "
                      "continuing single-process")


def hybrid_mesh(dp: int, tp: int) -> Mesh:
    """A (data=dp, model=tp) mesh that is DCN-topology-aware when spanning
    hosts: tp is confined to one host's ICI domain; the dp axis is ordered
    host-major so each process's addressable slots are contiguous."""
    if jax.process_count() == 1:
        return make_mesh(n_data=dp, n_model=tp)

    from jax.experimental import mesh_utils
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if tp > n_local or n_local % tp:
        raise ValueError(
            f"tp={tp} must divide the {n_local} local devices: tensor "
            "parallelism must stay inside one host's ICI domain")
    dp_local = n_local // tp
    if dp != n_proc * dp_local:
        raise ValueError(
            f"dp={dp} must equal hosts*local_dp = {n_proc}*{dp_local}")
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            (dp_local, tp), (n_proc, 1))      # DCN axis outermost on dp
        arr = np.asarray(devices).reshape(dp, tp)
    except ValueError:
        # Virtual CPU devices (and some single-slice topologies) all report
        # slice_index 0, so mesh_utils can't see the host boundary. Order
        # manually: host-major on dp (processes outermost), each host's tp
        # groups contiguous in local-device order — the same contract.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def owned_slots(n_slots: int, mesh: Mesh) -> range:
    """The contiguous slot range whose KV shards live on this process (the
    data axis is host-major under hybrid_mesh). Useful when a serving
    frontend wants exactly one host to own each response stream even though
    every host computes all of them."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return range(n_slots)
    per = n_slots // n_proc
    pid = jax.process_index()
    return range(pid * per, (pid + 1) * per)
