"""Cross-host orchestration scaffolding (parallel/multihost.py).

Real DCN transport needs a pod slice; what IS testable single-process:
the initialize() no-op path, the hybrid mesh degenerating to the plain
mesh, slot ownership, and that the mesh the BatchEngine gets through
rcfg.mesh_shape routes through hybrid_mesh (exercised by
test_scheduler_mesh for the compute path)."""
import jax
import numpy as np

from fastllama_tpu.parallel import multihost
from fastllama_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS, make_mesh


def test_initialize_single_process_noop():
    multihost.initialize()               # must not raise or hang
    assert jax.process_count() == 1


def test_hybrid_mesh_degenerates_to_plain():
    mesh = multihost.hybrid_mesh(dp=2, tp=4)
    ref = make_mesh(n_data=2, n_model=4)
    assert mesh.shape == ref.shape == {DATA_AXIS: 2, MODEL_AXIS: 4}
    assert (np.asarray(mesh.devices) == np.asarray(ref.devices)).all()


def test_owned_slots_single_process_full_range():
    mesh = multihost.hybrid_mesh(dp=2, tp=2)
    assert list(multihost.owned_slots(8, mesh)) == list(range(8))
