"""Forward-pass parity: JAX model vs the numpy oracle of Model::eval."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams
from fastllama_tpu.models.llama import (
    ForwardConfig, LayerParams, LlamaParams, forward, init_kv_cache, rms_norm,
)
from fastllama_tpu.models.fuse import make_layer_params
from fastllama_tpu.kernels.rope import rope_interleaved

from numpy_ref import (
    forward as np_forward, make_tiny_weights, rope_interleaved as np_rope,
    rms_norm as np_rms,
)

HP = HyperParams(n_vocab=64, n_embd=32, n_head=4, n_layer=2, n_rot=8)
N_FF = 48


def make_params(weights):
    """Oracle weights are [in, out] = the model's [K, N] dense convention."""
    layers = []
    for lw in weights["layers"]:
        layers.append(make_layer_params(
            HP.n_head,
            attention_norm=lw["attention_norm"], ffn_norm=lw["ffn_norm"],
            wq=("dense", lw["wq"]), wk=("dense", lw["wk"]),
            wv=("dense", lw["wv"]), wo=("dense", lw["wo"]),
            w1=("dense", lw["w1"]), w2=("dense", lw["w2"]),
            w3=("dense", lw["w3"]),
        ))
    return LlamaParams(
        tok_embeddings=jnp.asarray(weights["tok_embeddings"]),
        norm=jnp.asarray(weights["norm"]),
        output=jnp.asarray(weights["output"]),
        layers=layers,
    )


CFG = ForwardConfig(n_head=HP.n_head, n_rot=HP.n_rot, w_dtype="float32",
                    act_dtype="float32", use_pallas=False, all_logits=True)


def test_rms_norm_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    want = np_rms(x, w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rope_parity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 4, 8)).astype(np.float32)  # [B,T,H,hd]
    pos = np.array([7, 8, 9, 10, 11], np.int32)
    got = np.asarray(rope_interleaved(
        jnp.asarray(x), jnp.asarray(pos)[None, :], n_rot=8))
    want = np_rope(x[0], pos, n_rot=8)
    np.testing.assert_allclose(got[0], want, rtol=2e-5, atol=2e-5)


def test_rope_partial_rotation():
    # dims past n_rot must pass through (ggml partial rotary, mode 0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 2, 8)).astype(np.float32)
    pos = np.array([0, 1, 2], np.int32)
    got = np.asarray(rope_interleaved(jnp.asarray(x), jnp.asarray(pos)[None, :], n_rot=4))
    np.testing.assert_array_equal(got[..., 4:], x[..., 4:])
    want = np_rope(x[0], pos, n_rot=4)
    np.testing.assert_allclose(got[0, ..., :4], want[..., :4], rtol=2e-5, atol=2e-5)


def test_forward_prefill_parity():
    rng = np.random.default_rng(3)
    weights = make_tiny_weights(rng, n_vocab=HP.n_vocab, n_embd=HP.n_embd,
                                n_head=HP.n_head, n_layer=HP.n_layer, n_ff=N_FF)
    params = make_params(weights)
    tokens = np.array([1, 5, 9, 3, 20], np.int32)
    s = 16

    kv_k_np = np.zeros((HP.n_layer, s, HP.n_head, HP.head_dim))
    kv_v_np = np.zeros_like(kv_k_np)
    want = np_forward(weights, tokens, 0, kv_k_np, kv_v_np, HP.n_head, HP.n_rot)

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    logits, kv, emb = forward(
        params, jnp.asarray(tokens)[None, :], jnp.int32(0), kv, CFG)
    np.testing.assert_allclose(np.asarray(logits)[0], want, rtol=1e-4, atol=1e-4)

    # KV cache contents must match for the written range
    got_k = np.stack([np.asarray(k)[0, :5] for k, _ in kv])
    np.testing.assert_allclose(got_k, kv_k_np[:, :5].reshape(got_k.shape),
                               rtol=1e-4, atol=1e-4)


def test_forward_decode_matches_prefill():
    """Feeding tokens one-by-one through the cache must equal one prefill."""
    rng = np.random.default_rng(4)
    weights = make_tiny_weights(rng, n_vocab=HP.n_vocab, n_embd=HP.n_embd,
                                n_head=HP.n_head, n_layer=HP.n_layer, n_ff=N_FF)
    params = make_params(weights)
    tokens = np.array([2, 7, 11, 4], np.int32)
    s = 8

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    logits_all, *_ = forward(params, jnp.asarray(tokens)[None, :],
                             jnp.int32(0), kv, CFG)

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    outs = []
    for i, tok in enumerate(tokens):
        logits, kv, _ = forward(
            params, jnp.asarray([[tok]], jnp.int32), jnp.int32(i), kv, CFG)
        outs.append(np.asarray(logits)[0, -1])
    np.testing.assert_allclose(np.stack(outs), np.asarray(logits_all)[0],
                               rtol=2e-4, atol=2e-4)


def test_forward_padded_tokens_do_not_corrupt():
    """Padded tail tokens write garbage cache slots that a later call
    overwrites; earlier logits must be unaffected."""
    rng = np.random.default_rng(5)
    weights = make_tiny_weights(rng, n_vocab=HP.n_vocab, n_embd=HP.n_embd,
                                n_head=HP.n_head, n_layer=HP.n_layer, n_ff=N_FF)
    params = make_params(weights)
    s = 16
    real = np.array([1, 5, 9], np.int32)
    padded = np.array([1, 5, 9, 0, 0], np.int32)

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    l_real, *_ = forward(params, jnp.asarray(real)[None], jnp.int32(0), kv, CFG)

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    l_pad, kv2, _ = forward(params, jnp.asarray(padded)[None],
                            jnp.int32(0), kv, CFG)
    np.testing.assert_allclose(np.asarray(l_pad)[0, :3], np.asarray(l_real)[0],
                               rtol=1e-5, atol=1e-5)
    # continue from n_past=3 with a real token; must match the clean path
    tok = jnp.asarray([[12]], jnp.int32)
    a, *_ = forward(params, tok, jnp.int32(3), kv2, CFG)
    kv3 = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    _, kv3, _ = forward(params, jnp.asarray(real)[None], jnp.int32(0), kv3, CFG)
    b, *_ = forward(params, tok, jnp.int32(3), kv3, CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
