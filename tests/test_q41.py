"""Affine (q4_1/GPTQ) weight support tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import FType, HyperParams, RuntimeConfig
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.io.convert import _gptq_to_q4_1
from fastllama_tpu.kernels.q4_matmul import q4_matmul
from fastllama_tpu.models.loader import load_model
from fastllama_tpu.quant import q4
from fastllama_tpu.quant.tensor import make_matmul_weight_q41


def test_q41_matmul_matches_dequant():
    rng = np.random.default_rng(0)
    n, k, m = 32, 96, 4
    x = rng.standard_normal((m, k)).astype(np.float32)
    dense = (rng.standard_normal((n, k)) * 0.2 + 0.1).astype(np.float32)
    codes, d, mn = q4.quantize_q4_1(dense)
    w = make_matmul_weight_q41(codes, d, mn)
    ref = x @ q4.dequantize_q4_1(codes, d, mn).T
    y = np.asarray(q4_matmul(jnp.asarray(x), w, use_pallas=False,
                             w_dtype=jnp.float32))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_q41_pallas_interpret():
    rng = np.random.default_rng(1)
    n, k, m = 128, 256, 8
    x = rng.standard_normal((m, k)).astype(np.float32)
    dense = (rng.standard_normal((n, k)) * 0.2).astype(np.float32)
    codes, d, mn = q4.quantize_q4_1(dense)
    w = make_matmul_weight_q41(codes, d, mn)
    ref = x @ q4.dequantize_q4_1(codes, d, mn).T
    y = np.asarray(q4_matmul(jnp.asarray(x), w, use_pallas=True,
                             interpret=True, w_dtype=jnp.float32))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_gptq_unpack_roundtrip():
    """Build a synthetic GPTQ tensor group and check the q4_1 extraction
    reproduces the exact dequantized values."""
    rng = np.random.default_rng(2)
    k, n, groupsize = 128, 64, 32
    groups = k // groupsize
    nib = rng.integers(0, 16, (k, n), dtype=np.uint8)        # [K, N] nibbles
    scales = rng.uniform(0.01, 0.1, (groups, n)).astype(np.float32)
    zq = rng.integers(0, 16, (groups, n), dtype=np.uint8)

    # pack qweight [K/8, N] int32, little-endian nibbles
    def pack_le(nibbles):  # [R, C] -> [R/8, C] int32 packed along axis 0
        r, c = nibbles.shape
        out = np.zeros((r // 8, c), np.uint32)
        for j in range(8):
            out |= nibbles[j::8].astype(np.uint32) << (4 * j)
        return out.view(np.int32)

    qweight = pack_le(nib)                                   # [K/8, N]
    # qzeros packs along N: [groups, N/8]
    qzeros = np.zeros((groups, n // 8), np.uint32)
    for j in range(8):
        qzeros |= zq[:, j::8].astype(np.uint32) << (4 * j)
    qzeros = qzeros.view(np.int32)

    tensors = {"w.qweight": qweight, "w.scales": scales, "w.qzeros": qzeros}
    codes, d, m = _gptq_to_q4_1(tensors, "w")
    assert codes.shape == (n, k)

    # expected dequant: w[r, c] = nib[c, r]*scale - (z+1)*scale
    got = q4.dequantize_q4_1(codes, d, m)                    # [N, K]
    exp = np.empty((n, k), np.float32)
    for c in range(k):
        g = c // groupsize
        exp[:, c] = (nib[c].astype(np.float32)
                     - (zq[g].astype(np.float32) + 1.0)) * scales[g]
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_gptq_act_order_rejected():
    tensors = {"w.qweight": np.zeros((4, 8), np.int32),
               "w.scales": np.ones((1, 8), np.float32),
               "w.qzeros": np.zeros((1, 1), np.int32),
               "w.g_idx": np.array([1, 0, 2, 3] * 8, np.int32)}
    with pytest.raises(ValueError, match="g_idx"):
        _gptq_to_q4_1(tensors, "w")


def test_q41_ggjt_end_to_end(tmp_path):
    """Write a tiny q4_1 GGJT, load it, and generate."""
    import sys
    sys.path.insert(0, "tests")
    from test_io import HP, tiny_vocab
    from fastllama_tpu.io.ggml_writer import write_ggjt

    rng = np.random.default_rng(3)
    d_model = HP.n_embd

    def q41(out, inn, s=0.15):
        dense = (rng.standard_normal((out, inn)) * s).astype(np.float32)
        return ("q4_0",) + q4.quantize_q4_0(dense)  # embeddings stay q4_0

    def q41w(out, inn, s=0.15):
        dense = (rng.standard_normal((out, inn)) * s).astype(np.float32)
        codes, dd, mm = q4.quantize_q4_1(dense)
        return ("q4_1", codes, dd, mm)

    n_ff = HP.n_ff
    tensors = {
        "tok_embeddings.weight": q41(HP.n_vocab, d_model, 0.4),
        "norm.weight": ("f32", np.ones(d_model, np.float32)),
        "output.weight": q41w(HP.n_vocab, d_model),
    }
    for i in range(HP.n_layer):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = ("f32", np.ones(d_model, np.float32))
        for w in ("wq", "wk", "wv", "wo"):
            tensors[p + f"attention.{w}.weight"] = q41w(d_model, d_model)
        tensors[p + "ffn_norm.weight"] = ("f32", np.ones(d_model, np.float32))
        tensors[p + "feed_forward.w1.weight"] = q41w(n_ff, d_model)
        tensors[p + "feed_forward.w2.weight"] = q41w(d_model, n_ff)
        tensors[p + "feed_forward.w3.weight"] = q41w(n_ff, d_model)

    path = str(tmp_path / "tiny_q41.bin")
    write_ggjt(path, HP, tiny_vocab(), tensors)
    rcfg = RuntimeConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                         weight_dtype="float32", use_pallas=False,
                         prefill_buckets=(8, 16, 32, 64))
    model = load_model(path, rcfg)
    s = FastLlama(model, n_keep=16, seed=1)
    assert s.ingest(" t1 t2")
    out = []
    assert s.generate(out.append, num_tokens=3, temp=0.0)
    assert np.isfinite(s.get_logits()).all()
