"""End-to-end session over a mesh-sharded model (RuntimeConfig.mesh_shape)
must match the unsharded session."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams, RuntimeConfig
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.engine.tokenizer import Vocab
from fastllama_tpu.io.ggml_writer import write_ggla
from fastllama_tpu.models.runtime import LlamaModel

from test_sharding import HP, N_FF, build_params


def big_vocab():
    toks = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    toks += [(bytes([i]), -1e6) for i in range(256)]
    toks += [(f" s{i}".encode(), 1.0) for i in range(HP.n_vocab - 259)]
    return Vocab.from_tokens(toks)


def make_model(mesh_shape):
    rng = np.random.default_rng(7)
    params = build_params(quantized=True, rng=rng)
    rcfg = RuntimeConfig(n_ctx=32, n_batch=8, kv_dtype="float32",
                         weight_dtype="float32", use_pallas=False,
                         prefill_buckets=(8, 16, 32),
                         mesh_shape=mesh_shape)
    return LlamaModel(HP, params, big_vocab(), rcfg)


def run_session(model, seed=5, lora=None):
    if lora:
        assert model.attach_lora(lora)
    s = FastLlama(model, n_keep=12, seed=seed)
    assert s.ingest(" s1 s2")
    out = []
    assert s.generate(out.append, num_tokens=4, temp=0.0)
    return "".join(out), s.get_logits().copy()


def test_sharded_session_matches_unsharded():
    text_ref, logits_ref = run_session(make_model(()))
    text_sh, logits_sh = run_session(make_model((1, 4)))
    np.testing.assert_allclose(logits_sh, logits_ref, rtol=2e-4, atol=2e-4)
    assert text_sh == text_ref


def test_sharded_session_with_lora(tmp_path):
    rng = np.random.default_rng(9)
    d = HP.n_embd
    ggla = str(tmp_path / "ad.bin")
    write_ggla(ggla, r=4, alpha=8, use_cache=True, tensors={
        "layers.0.attention.wq.weight.lora":
            (rng.standard_normal((d, d)) * 0.05).astype(np.float32),
        "layers.1.feed_forward.w2.weight.lora":
            (rng.standard_normal((d, N_FF)) * 0.05).astype(np.float32),
    })
    text_ref, logits_ref = run_session(make_model(()), lora=ggla)
    text_sh, logits_sh = run_session(make_model((1, 4)), lora=ggla)
    np.testing.assert_allclose(logits_sh, logits_ref, rtol=2e-4, atol=2e-4)

    # detach on the sharded model restores the base behavior
    m = make_model((1, 4))
    assert m.attach_lora(ggla)
    assert m.detach_lora()
    text_detached, logits_detached = run_session(m)
    _, logits_base = run_session(make_model(()))
    np.testing.assert_allclose(logits_detached, logits_base,
                               rtol=2e-4, atol=2e-4)
