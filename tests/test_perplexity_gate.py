"""Quantization-quality gate: q4_0 perplexity must stay close to the same
model's full-precision perplexity (the miniature version of the WikiText-2
ppl-Δ contract in BASELINE.md — the bit-exact q4_0 repack means the Δ on real
weights is the reference's by construction; this validates the harness)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams, RuntimeConfig
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.models.fuse import make_layer_params
from fastllama_tpu.models.llama import LlamaParams
from fastllama_tpu.models.runtime import LlamaModel
from fastllama_tpu.quant.q4 import dequantize_q4_0, quantize_q4_0
from fastllama_tpu.quant.tensor import make_embedding, make_matmul_weight

from test_session import tiny_vocab

HP = HyperParams(n_vocab=320, n_embd=64, n_head=4, n_layer=2, n_rot=16)
N_FF = 96
RCFG = RuntimeConfig(n_ctx=64, n_batch=32, kv_dtype="float32",
                     weight_dtype="float32", use_pallas=False,
                     prefill_buckets=(8, 16, 32, 64))
TEXT = " " + " ".join(f"w{i % 17} w{(i * 3) % 23}" for i in range(20))


def build_models():
    """Same random dense weights -> one f32 model, one q4_0 model."""
    rng = np.random.default_rng(42)
    d = HP.n_embd
    dense_specs = {}
    for i in range(HP.n_layer):
        for nm, (out, inn) in {"wq": (d, d), "wk": (d, d), "wv": (d, d),
                               "wo": (d, d), "w1": (N_FF, d), "w2": (d, N_FF),
                               "w3": (N_FF, d)}.items():
            dense_specs[(i, nm)] = (rng.standard_normal((out, inn)) * 0.15
                                    ).astype(np.float32)
    emb = (rng.standard_normal((HP.n_vocab, d)) * 0.4).astype(np.float32)
    head = (rng.standard_normal((HP.n_vocab, d)) * 0.15).astype(np.float32)

    def mk(quantized):
        layers = []
        for i in range(HP.n_layer):
            def spec(nm):
                w = dense_specs[(i, nm)]
                if quantized:
                    return ("q4",) + quantize_q4_0(w)
                return ("dense", np.ascontiguousarray(w.T))
            layers.append(make_layer_params(
                HP.n_head,
                attention_norm=np.ones(d, np.float32),
                ffn_norm=np.ones(d, np.float32),
                wq=spec("wq"), wk=spec("wk"), wv=spec("wv"), wo=spec("wo"),
                w1=spec("w1"), w2=spec("w2"), w3=spec("w3")))
        if quantized:
            table = make_embedding(*quantize_q4_0(emb))
            out = make_matmul_weight(*quantize_q4_0(head))
        else:
            table = jnp.asarray(emb)
            out = jnp.asarray(np.ascontiguousarray(head.T))
        params = LlamaParams(tok_embeddings=table, norm=jnp.ones(d),
                             output=out, layers=layers)
        return LlamaModel(HP, params, tiny_vocab(HP.n_vocab), RCFG)

    return mk(False), mk(True)


def test_q4_ppl_close_to_fp():
    m_fp, m_q4 = build_models()
    ppl_fp = FastLlama(m_fp, n_keep=16).perplexity(TEXT)
    ppl_q4 = FastLlama(m_q4, n_keep=16).perplexity(TEXT)
    assert np.isfinite(ppl_fp) and np.isfinite(ppl_q4)
    # quantization error on random tiny models is larger than on trained 7B
    # weights; the gate here is "same ballpark", i.e. |Δ log ppl| small
    dlog = abs(np.log(ppl_q4) - np.log(ppl_fp))
    assert dlog < 0.35, (ppl_fp, ppl_q4)


INT8_RCFG = RuntimeConfig(n_ctx=512, n_batch=256, kv_dtype="float32",
                          weight_dtype="float32", use_pallas=False,
                          prefill_buckets=(16, 64, 128, 256, 512))
LONG_TEXT = " " + " ".join(
    f"w{i % 17} w{(i * 3) % 23} w{(i * 7) % 11}" for i in range(120))


def build_q4_model(prefill_int8):
    """The gate's q4 model with 256-wide eval windows so the int8 prefill
    path actually engages (it needs M >= 256; on CPU the exact XLA
    emulation q4_matmul_int8_xla carries the kernel's arithmetic)."""
    import dataclasses
    global RCFG
    old = RCFG
    RCFG = dataclasses.replace(INT8_RCFG, prefill_int8=prefill_int8)
    try:
        _, m_q4 = build_models()
    finally:
        RCFG = old
    return m_q4


def test_int8_prefill_ppl_within_gate():
    """The activation-quantized int8 prefill path's quality cost, measured
    end-to-end (VERDICT r4 #2): |dlog ppl| of int8-vs-exact must sit inside
    the q4-vs-f32 gate's own margin. Random tiny-model weights are the
    WORST case for activation quant (no outlier structure to hide in);
    measured 0.013 vs the q4 gate's 0.018 on the same text."""
    ppl_exact = FastLlama(build_q4_model(False), n_keep=16).perplexity(LONG_TEXT)
    ppl_i8 = FastLlama(build_q4_model(True), n_keep=16).perplexity(LONG_TEXT)
    assert np.isfinite(ppl_exact) and np.isfinite(ppl_i8)
    dlog = abs(np.log(ppl_i8) - np.log(ppl_exact))
    assert dlog < 0.03, (ppl_exact, ppl_i8, dlog)


def test_int8_prefill_greedy_divergence_bounded():
    """Greedy-stream divergence of a prefill_int8 session vs the exact
    session after a ~480-token ingest: the first diverging chunk index must
    be deep into the stream and the prefill logits near-identical
    (measured: corr 0.9995, first divergence at chunk 30 of 128 on the
    worst-case random model; recorded in BASELINE.md round-5)."""
    s_exact = FastLlama(build_q4_model(False), n_keep=16)
    s_i8 = FastLlama(build_q4_model(True), n_keep=16)
    prompt = " " + " ".join(f"w{i % 13}" for i in range(150))
    assert s_exact.ingest(prompt) and s_i8.ingest(prompt)
    a, b = s_exact.get_logits(), s_i8.get_logits()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    ta, tb = [], []
    s_exact.generate(lambda t: ta.append(t), num_tokens=128, temp=0.0)
    s_i8.generate(lambda t: tb.append(t), num_tokens=128, temp=0.0)
    div = next((i for i, (x, y) in enumerate(zip(ta, tb)) if x != y), None)
    assert div is None or div >= 10, (div, ta[:12], tb[:12])


def test_explicit_false_pins_bit_faithful(monkeypatch):
    """RuntimeConfig/ForwardConfig prefill_int8=False must pin the exact
    bf16/f32 dequant path even under FASTLLAMA_PREFILL_INT8=1 (the round-4
    advisor finding: False used to be indistinguishable from 'defer')."""
    from fastllama_tpu.kernels.q4_matmul import q4_matmul
    from fastllama_tpu.quant.q4 import dequantize_q4_0, quantize_q4_0
    from fastllama_tpu.quant.tensor import make_matmul_weight

    monkeypatch.setenv("FASTLLAMA_PREFILL_INT8", "1")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    dense = rng.standard_normal((256, 512)).astype(np.float32) * 0.1
    codes, scales = quantize_q4_0(dense)
    w = make_matmul_weight(codes, scales)
    y_ref = x @ dequantize_q4_0(codes, scales).T
    y = q4_matmul(jnp.asarray(x), w, use_pallas=False,
                  w_dtype=jnp.float32, prefill_int8=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-4)


def test_q4_dequant_error_propagates_bounded():
    """Direct check that dequantized logits stay close to dense logits."""
    m_fp, m_q4 = build_models()
    s_fp = FastLlama(m_fp, n_keep=16)
    s_q4 = FastLlama(m_q4, n_keep=16)
    assert s_fp.ingest(" w1 w2 w3")
    assert s_q4.ingest(" w1 w2 w3")
    s_fp.generate(lambda t: None, num_tokens=1, temp=0.0)
    s_q4.generate(lambda t: None, num_tokens=1, temp=0.0)
    a, b = s_fp.get_logits(), s_q4.get_logits()
    corr = np.corrcoef(a, b)[0, 1]
    # random gaussian weights are the worst case for q4_0 (~7% per-element
    # error compounding over layers); trained weights correlate far higher.
    # This is a plumbing check that quantization flows through correctly.
    assert corr > 0.85, corr
