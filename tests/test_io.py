"""IO tests: GGJT write/read roundtrip, fltpu conversion, full model load,
and LoRA attach/detach, on a synthetic tiny checkpoint."""
import numpy as np
import pytest

from fastllama_tpu.config import FType, HyperParams, RuntimeConfig
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.engine.tokenizer import Vocab
from fastllama_tpu.io.convert import convert_ggml, hf_to_ggml_name, permute_qk
from fastllama_tpu.io.ggml_reader import read_ggml_checkpoint, read_ggml_file
from fastllama_tpu.io.ggml_writer import write_ggjt, write_ggla
from fastllama_tpu.models.loader import load_model
from fastllama_tpu.quant.q4 import dequantize_q4_0, quantize_q4_0

HP = HyperParams(n_vocab=300, n_embd=64, n_mult=32, n_head=4, n_layer=2,
                 n_rot=16, ftype=FType.MOSTLY_Q4_0)
N_FF = HP.n_ff  # ((2*256/3)+31)//32*32


def tiny_vocab():
    toks = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    toks += [(bytes([i]), -1e6) for i in range(256)]
    toks += [(f" t{i}".encode(), 1.0) for i in range(HP.n_vocab - 259)]
    return Vocab.from_tokens(toks)


def build_tensors(rng):
    """name -> ('q4_0', codes, scales) or ('f32', arr); ggml orientation."""
    d = HP.n_embd

    def q(out, inn, s=0.15):
        dense = (rng.standard_normal((out, inn)) * s).astype(np.float32)
        return ("q4_0",) + quantize_q4_0(dense)

    tensors = {
        "tok_embeddings.weight": q(HP.n_vocab, d, 0.4),
        "norm.weight": ("f32", np.ones(d, np.float32)),
        "output.weight": q(HP.n_vocab, d),
    }
    for i in range(HP.n_layer):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = ("f32", np.ones(d, np.float32))
        tensors[p + "attention.wq.weight"] = q(d, d)
        tensors[p + "attention.wk.weight"] = q(d, d)
        tensors[p + "attention.wv.weight"] = q(d, d)
        tensors[p + "attention.wo.weight"] = q(d, d)
        tensors[p + "ffn_norm.weight"] = ("f32", np.ones(d, np.float32))
        tensors[p + "feed_forward.w1.weight"] = q(N_FF, d)
        tensors[p + "feed_forward.w2.weight"] = q(d, N_FF)
        tensors[p + "feed_forward.w3.weight"] = q(N_FF, d)
    return tensors


@pytest.fixture(scope="module")
def ggjt_path(tmp_path_factory):
    rng = np.random.default_rng(11)
    path = tmp_path_factory.mktemp("ckpt") / "tiny.bin"
    write_ggjt(path, HP, tiny_vocab(), build_tensors(rng))
    return str(path)


RCFG = RuntimeConfig(n_ctx=64, n_batch=16, kv_dtype="float32",
                     weight_dtype="float32", use_pallas=False,
                     prefill_buckets=(8, 16, 32, 64))


def test_ggjt_roundtrip(ggjt_path):
    gg = read_ggml_file(ggjt_path)
    assert gg.hyperparams.n_vocab == HP.n_vocab
    assert gg.hyperparams.n_embd == HP.n_embd
    assert gg.vocab.size == HP.n_vocab
    assert gg.vocab.token_bytes(259) == b" t0"
    assert len(gg.tensors) == 3 + 9 * HP.n_layer
    t = gg.tensors["layers.0.attention.wq.weight"]
    assert t.shape == (HP.n_embd, HP.n_embd)
    assert t.offset % 32 == 0
    # q4_0 payload decodes losslessly
    codes, scales = gg.q4_0("layers.0.attention.wq.weight")
    assert codes.shape == (HP.n_embd, HP.n_embd)
    dense = dequantize_q4_0(codes, scales)
    assert np.isfinite(dense).all()


def test_load_model_from_ggjt(ggjt_path):
    model = load_model(ggjt_path, RCFG)
    s = FastLlama(model, n_keep=16, seed=3)
    assert s.ingest(" t1 t2")
    out = []
    assert s.generate(out.append, num_tokens=4, temp=0.0)
    assert s.n_past > 0


def test_convert_ggml_to_fltpu_and_load(ggjt_path, tmp_path):
    dst = str(tmp_path / "tiny.fltpu")
    convert_ggml(ggjt_path, dst, FType.MOSTLY_Q4_0)
    model = load_model(dst, RCFG)
    s = FastLlama(model, n_keep=16, seed=3)
    assert s.ingest(" t1 t2")
    out1 = []
    assert s.generate(out1.append, num_tokens=4, temp=0.0)

    # logits must be IDENTICAL to loading the GGJT directly (repack is
    # bit-exact, no requantization)
    m2 = load_model(ggjt_path, RCFG)
    s2 = FastLlama(m2, n_keep=16, seed=3)
    assert s2.ingest(" t1 t2")
    out2 = []
    assert s2.generate(out2.append, num_tokens=4, temp=0.0)
    np.testing.assert_array_equal(s.get_logits(), s2.get_logits())
    assert "".join(out1) == "".join(out2)


def test_export_ggjt_roundtrip(ggjt_path, tmp_path):
    """ggml -> fltpu -> ggjt must round-trip q4_0 payloads bit-exactly."""
    from fastllama_tpu.io.convert import export_ggjt
    flt = str(tmp_path / "rt.fltpu")
    convert_ggml(ggjt_path, flt, FType.MOSTLY_Q4_0)
    out = str(tmp_path / "rt.bin")
    export_ggjt(flt, out, FType.MOSTLY_Q4_0)

    a = read_ggml_checkpoint(ggjt_path)
    b = read_ggml_checkpoint(out)
    assert b.hyperparams.n_embd == a.hyperparams.n_embd
    for name in ("layers.0.attention.wq.weight", "output.weight",
                 "tok_embeddings.weight"):
        ca, sa = a.q4_0(name)
        cb, sb = b.q4_0(name)
        np.testing.assert_array_equal(cb, ca)
        np.testing.assert_array_equal(sb, sa)
    # the exported file loads and generates
    model = load_model(out, RCFG)
    s = FastLlama(model, n_keep=16, seed=2)
    assert s.ingest(" t1")
    assert s.generate(lambda t: None, num_tokens=2, temp=0.0)


def test_hf_name_mapping():
    assert hf_to_ggml_name("model.embed_tokens.weight") == "tok_embeddings.weight"
    assert hf_to_ggml_name("lm_head.weight") == "output.weight"
    assert (hf_to_ggml_name("model.layers.5.self_attn.q_proj.weight")
            == "layers.5.attention.wq.weight")
    assert (hf_to_ggml_name("model.layers.0.mlp.down_proj.weight")
            == "layers.0.feed_forward.w2.weight")
    assert hf_to_ggml_name("model.rotary.inv_freq") is None


def test_permute_qk_is_involution_free_roundtrip():
    # permute converts rotate-half weights to interleaved order; applying the
    # inverse permutation restores the original
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    p = permute_qk(w, n_head=4)
    # inverse: same reshape with swapped axes
    inv = (p.reshape(4, 32 // 4 // 2, 2, 16).swapaxes(1, 2).reshape(w.shape))
    np.testing.assert_array_equal(inv, w)


def test_lora_attach_detach(ggjt_path, tmp_path):
    model = load_model(ggjt_path, RCFG)
    s = FastLlama(model, n_keep=16, seed=5)
    assert s.ingest(" t3 t4")
    base_logits = s.get_logits().copy() if s.get_logits().size else None
    s.generate(lambda t: None, num_tokens=1, temp=0.0)
    base_row = s.get_logits().copy()

    # build a cached-ΔW adapter for wq of layer 0 + w1 of layer 1
    rng = np.random.default_rng(2)
    d = HP.n_embd
    delta_wq = (rng.standard_normal((d, d)) * 0.05).astype(np.float32)
    delta_w1 = (rng.standard_normal((N_FF, d)) * 0.05).astype(np.float32)
    ggla = str(tmp_path / "adapter.bin")
    write_ggla(ggla, r=8, alpha=16, use_cache=True, tensors={
        "layers.0.attention.wq.weight.lora": delta_wq,
        "layers.1.feed_forward.w1.weight.lora": delta_w1,
    })

    assert model.attach_lora(ggla)
    assert model.lora_path == ggla
    # double attach refused
    assert not model.attach_lora(ggla)

    # logits change under the adapter
    m2 = load_model(ggjt_path, RCFG)
    assert m2.attach_lora(ggla)
    s2 = FastLlama(m2, n_keep=16, seed=5)
    assert s2.ingest(" t3 t4")
    s2.generate(lambda t: None, num_tokens=1, temp=0.0)
    lora_row = s2.get_logits().copy()
    assert not np.array_equal(base_row, lora_row)

    # detach restores bit-identical behavior
    assert m2.detach_lora()
    assert m2.lora_path is None
    s3 = FastLlama(m2, n_keep=16, seed=5)
    assert s3.ingest(" t3 t4")
    s3.generate(lambda t: None, num_tokens=1, temp=0.0)
    np.testing.assert_array_equal(s3.get_logits(), base_row)


def test_lora_low_rank_matches_cached(ggjt_path, tmp_path):
    """A no-cache adapter (A,B) must produce the same logits as the cached
    ΔW = B·A·scale adapter."""
    rng = np.random.default_rng(3)
    d = HP.n_embd
    r, alpha = 4, 8
    scale = alpha / r
    A = (rng.standard_normal((r, d)) * 0.1).astype(np.float32)   # [r, in]
    B = (rng.standard_normal((d, r)) * 0.1).astype(np.float32)   # [out, r]
    delta = (B @ A) * scale                                       # [out, in]

    cached = str(tmp_path / "cached.bin")
    write_ggla(cached, r=r, alpha=alpha, use_cache=True, tensors={
        "layers.0.attention.wv.weight.lora": delta})
    nocache = str(tmp_path / "nocache.bin")
    write_ggla(nocache, r=r, alpha=alpha, use_cache=False, tensors={
        "layers.0.attention.wv.weight.loraA": (A * scale).T,  # [in, r]
        "layers.0.attention.wv.weight.loraB": B,              # [out, r]
    })

    rows = []
    for adapter in (cached, nocache):
        m = load_model(ggjt_path, RCFG)
        assert m.attach_lora(adapter)
        s = FastLlama(m, n_keep=16, seed=9)
        assert s.ingest(" t5")
        s.generate(lambda t: None, num_tokens=1, temp=0.0)
        rows.append(s.get_logits().copy())
    np.testing.assert_allclose(rows[0], rows[1], rtol=2e-5, atol=2e-5)


def test_lora_unknown_base_fails(ggjt_path, tmp_path):
    ggla = str(tmp_path / "bad.bin")
    write_ggla(ggla, r=2, alpha=4, use_cache=True, tensors={
        "layers.99.attention.wq.weight.lora": np.zeros((4, 4), np.float32)})
    model = load_model(ggjt_path, RCFG)
    assert not model.attach_lora(ggla)
