"""Golden tests for block quantization, bit-exact vs the ggml reference
semantics (quantize_row_q4_0_reference, /root/reference/lib/ggml.c:630-664)."""
import numpy as np
import pytest

from fastllama_tpu.quant import q4
from fastllama_tpu.quant.tensor import (
    split_pack_lastdim, split_unpack_lastdim, make_matmul_weight,
    matmul_weight_to_codes, make_embedding,
)


def ggml_q4_0_scalar(x):
    """Straight-line transliteration of the reference formula for one block,
    used as the golden oracle (d = amax/7; q = roundf(v/d) + 8)."""
    import math
    x = [np.float32(v) for v in x]
    amax = np.float32(0.0)
    for v in x:
        amax = max(amax, abs(v))
    d = np.float32(amax / np.float32(7.0))
    inv = np.float32(1.0) / d if d else np.float32(0.0)
    qs = []
    for v in x:
        scaled = np.float32(v * inv)
        r = math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
        qs.append(int(r) + 8)
    return d, qs


def test_q4_0_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32) * 3.0
    codes, scales = q4.quantize_q4_0(x)
    for i in range(64):
        d, qs = ggml_q4_0_scalar(x[i])
        assert scales[i, 0] == d
        assert list(codes[i]) == qs


def test_q4_0_nibble_range():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    codes, _ = q4.quantize_q4_0(x)
    assert codes.min() >= 1 and codes.max() <= 15


def test_q4_0_round_half_away_from_zero():
    # Construct a block where v/d lands exactly on .5 boundaries.
    # amax = 7 -> d = 1.0; values ±0.5 must round to ±1 (away from zero),
    # unlike numpy's default round-half-even.
    x = np.zeros(32, np.float32)
    x[0] = 7.0
    x[1] = 0.5
    x[2] = -0.5
    x[3] = 2.5
    x[4] = -2.5
    codes, scales = q4.quantize_q4_0(x[None])
    assert scales[0, 0] == np.float32(1.0)
    assert codes[0, 0] == 15      # 7 + 8
    assert codes[0, 1] == 9       # +1 + 8
    assert codes[0, 2] == 7       # -1 + 8
    assert codes[0, 3] == 11      # +3 + 8 (2.5 -> 3)
    assert codes[0, 4] == 5       # -3 + 8


def test_q4_0_zero_block():
    x = np.zeros((1, 32), np.float32)
    codes, scales = q4.quantize_q4_0(x)
    assert scales[0, 0] == 0.0
    assert (codes == 8).all()
    assert (q4.dequantize_q4_0(codes, scales) == 0).all()


def test_q4_0_roundtrip_error_bound():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    y = q4.dequantize_q4_0(codes, scales)
    # max error is d/2 per element
    d_exp = np.repeat(scales, 32, axis=-1)
    assert (np.abs(y - x) <= d_exp / 2 + 1e-7).all()


def test_q4_0_wire_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 96)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    buf = q4.q4_0_to_wire(codes, scales)
    assert len(buf) == 4 * 3 * q4.Q4_0_BLOCK_BYTES
    codes2, scales2 = q4.q4_0_from_wire(buf, (4, 96))
    assert (codes2 == codes).all()
    assert (scales2 == scales).all()


def test_q4_0_wire_matches_ggml_byte_layout():
    # One block with known codes: verify byte l = q[2l] | q[2l+1]<<4 and the
    # leading f32 little-endian scale (block_q4_0, lib/ggml.c:590-595).
    x = np.zeros(32, np.float32)
    x[0] = 7.0   # code 15
    x[1] = -7.0  # code 1
    codes, scales = q4.quantize_q4_0(x[None])
    buf = q4.q4_0_to_wire(codes, scales)
    assert np.frombuffer(buf[:4], np.float32)[0] == np.float32(1.0)
    assert buf[4] == (15 | (1 << 4))
    assert all(b == (8 | (8 << 4)) for b in buf[5:20])


def test_q4_1_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 64)).astype(np.float32) + 1.5
    codes, d, m = q4.quantize_q4_1(x)
    y = q4.dequantize_q4_1(codes, d, m)
    d_exp = np.repeat(d, 32, axis=-1)
    assert (np.abs(y - x) <= d_exp / 2 + 1e-6).all()
    buf = q4.q4_1_to_wire(codes, d, m)
    codes2, d2, m2 = q4.q4_1_from_wire(buf, (8, 64))
    assert (codes2 == codes).all() and (d2 == d).all() and (m2 == m).all()


def test_q8_0():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    codes, d, s = q4.quantize_q8_0(x)
    assert codes.dtype == np.int8
    y = q4.dequantize_q8_0(codes, d)
    d_exp = np.repeat(d, 32, axis=-1)
    assert (np.abs(y - x) <= d_exp / 2 + 1e-6).all()
    # s = d * sum(block codes)
    blocks = codes.reshape(4, 2, 32).astype(np.int64).sum(-1)
    np.testing.assert_allclose(s, d * blocks, rtol=1e-6)


def test_split_pack_roundtrip():
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 16, (8, 128), dtype=np.uint8)
    packed = split_pack_lastdim(codes)
    assert packed.shape == (8, 64)
    assert (split_unpack_lastdim(packed) == codes).all()


def test_matmul_weight_layout_roundtrip():
    rng = np.random.default_rng(7)
    n, k = 16, 96
    codes = rng.integers(0, 16, (n, k), dtype=np.uint8)
    scales = rng.standard_normal((n, k // 32)).astype(np.float32)
    w = make_matmul_weight(codes, scales)
    # storage is padded to 256-multiples; logical N preserved
    assert w.n_logical == n and w.k == 256 and w.n_padded == 256
    codes2, scales2 = matmul_weight_to_codes(w, k_logical=k)
    assert (codes2 == codes).all()
    assert (scales2 == scales).all()


def test_dequant_matmul_weight_matches_reference_dequant():
    import jax.numpy as jnp
    from fastllama_tpu.quant.tensor import dequant_matmul_weight
    rng = np.random.default_rng(8)
    x = rng.standard_normal((24, 64)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    w = make_matmul_weight(codes, scales)
    dense = np.asarray(dequant_matmul_weight(w, dtype=jnp.float32))
    ref = q4.dequantize_q4_0(codes, scales)  # [N, K]
    # stored dims are padded; the logical corner must match, padding must be 0
    np.testing.assert_array_equal(dense[:64, :24], ref.T)
    assert (dense[64:] == 0).all() and (dense[:, 24:] == 0).all()


def test_dequant_embedding_rows():
    import jax.numpy as jnp
    from fastllama_tpu.quant.tensor import dequant_embedding_rows
    rng = np.random.default_rng(9)
    x = rng.standard_normal((10, 64)).astype(np.float32)
    codes, scales = q4.quantize_q4_0(x)
    table = make_embedding(codes, scales)
    ids = jnp.asarray([3, 0, 9])
    out = np.asarray(dequant_embedding_rows(table, ids))
    ref = q4.dequantize_q4_0(codes, scales)
    np.testing.assert_array_equal(out, ref[[3, 0, 9]])
