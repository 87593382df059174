"""Native C++ kernel tests (skipped when the library isn't built)."""
import numpy as np
import pytest

from fastllama_tpu.quant import native, q4
from fastllama_tpu.quant.tensor import matmul_weight_from_planes, make_matmul_weight

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_load_race_all_threads_agree():
    """Round-3 verdict weak #2 regression: the lock-free fast path in
    native._load must never observe _TRIED=True with _LIB unset
    mid-LoadLibrary. Reset the module state and hammer available() from 8
    threads; every thread must see the SAME verdict (mixed verdicts made
    the parallel GGJT loader fuse q4/q4p weight kinds and crash)."""
    import threading

    for trial in range(20):
        native._LIB = None
        native._TRIED = False
        barrier = threading.Barrier(8)
        results = [None] * 8

        def probe(i):
            barrier.wait()
            results[i] = native.available()

        ts = [threading.Thread(target=probe, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(r == results[0] for r in results), (
            f"trial {trial}: mixed native-availability verdicts {results}")
        assert results[0] is True  # library IS built (see pytestmark)


def test_native_quantize_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 256)).astype(np.float32) * 2.5
    c_np, s_np = q4.quantize_q4_0(x)
    c_nat, s_nat = native.quantize_q4_0(x)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(s_nat, s_np)


def test_native_quantize_half_away_rounding():
    x = np.zeros((1, 32), np.float32)
    x[0, 0] = 7.0
    x[0, 1] = 0.5
    x[0, 2] = -2.5
    c, s = native.quantize_q4_0(x)
    assert s[0, 0] == np.float32(1.0)
    assert c[0, 1] == 9 and c[0, 2] == 5


def test_native_repack_matches_numpy_path():
    rng = np.random.default_rng(1)
    n, k = 48, 128
    x = rng.standard_normal((n, k)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    wire = np.frombuffer(q4.q4_0_to_wire(codes, scales), np.uint8)

    ref = make_matmul_weight(codes, scales)          # numpy path (padded)
    planes = native.repack_q4_wire(wire, n, k, n_pad=ref.n_padded,
                                   k_pad=ref.k)
    assert planes is not None
    qs, sc = planes
    np.testing.assert_array_equal(qs, np.asarray(ref.qs))
    np.testing.assert_array_equal(sc, np.asarray(ref.scales))


def test_native_repack_unpadded_then_padded_container():
    rng = np.random.default_rng(2)
    n, k = 16, 96
    x = rng.standard_normal((n, k)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    wire = np.frombuffer(q4.q4_0_to_wire(codes, scales), np.uint8)
    qs, sc = native.repack_q4_wire(wire, n, k, n_pad=n, k_pad=k)
    w = matmul_weight_from_planes(qs, sc)
    ref = make_matmul_weight(codes, scales)
    np.testing.assert_array_equal(np.asarray(w.qs), np.asarray(ref.qs))
    np.testing.assert_array_equal(np.asarray(w.scales), np.asarray(ref.scales))
