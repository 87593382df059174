"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The sharded (shard_map + psum/all_gather) forward must produce the same
logits as the single-device forward on identical weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams
from fastllama_tpu.models.fuse import make_layer_params
from fastllama_tpu.models.llama import (
    ForwardConfig, LlamaParams, LoraTerm, forward, init_kv_cache,
)
from fastllama_tpu.parallel.sharding import (
    make_mesh, make_sharded_forward, shard_kv, shard_params,
)
from fastllama_tpu.quant.q4 import quantize_q4_0
from fastllama_tpu.quant.tensor import make_embedding, make_matmul_weight

# dims chosen so every sharded axis divides tp=8, including the q4 scale
# planes of reduction-sharded weights ((K/32) % 8 == 0)
HP = HyperParams(n_vocab=512, n_embd=256, n_head=8, n_layer=2, n_rot=16)
N_FF = 256


def build_params(quantized: bool, rng):
    d = HP.n_embd

    def spec(k_in, n_out, s=0.15):
        dense = (rng.standard_normal((n_out, k_in)) * s).astype(np.float32)
        if quantized:
            return ("q4",) + quantize_q4_0(dense)
        return ("dense", np.ascontiguousarray(dense.T))

    layers = [make_layer_params(
        HP.n_head,
        attention_norm=np.ones(d, np.float32), ffn_norm=np.ones(d, np.float32),
        wq=spec(d, d), wk=spec(d, d), wv=spec(d, d), wo=spec(d, d),
        w1=spec(d, N_FF), w2=spec(N_FF, d), w3=spec(d, N_FF),
    ) for _ in range(HP.n_layer)]
    emb = (rng.standard_normal((HP.n_vocab, d)) * 0.4).astype(np.float32)
    if quantized:
        table = make_embedding(*quantize_q4_0(emb))
        out = make_matmul_weight(*quantize_q4_0(
            (rng.standard_normal((HP.n_vocab, d)) * 0.15).astype(np.float32)))
    else:
        table = jnp.asarray(emb)
        out = jnp.asarray((rng.standard_normal((d, HP.n_vocab)) * 0.15
                           ).astype(np.float32))
    return LlamaParams(tok_embeddings=table, norm=jnp.ones(d),
                       output=out, layers=layers)


CFG = ForwardConfig(n_head=HP.n_head, n_rot=HP.n_rot, w_dtype="float32",
                    act_dtype="float32", use_pallas=False, all_logits=True,
                    vocab_size=HP.n_vocab)


def _run_pair(params, mesh, batch, seq, s):
    tokens = np.arange(batch * seq, dtype=np.int32).reshape(batch, seq) % 200
    kv = init_kv_cache(HP, batch, s, dtype=jnp.float32)
    ref_logits, _, _ = forward(
        params, jnp.asarray(tokens), jnp.int32(0), kv, CFG, jnp.int32(seq - 1))

    sh_params = shard_params(params, mesh)
    fn = make_sharded_forward(mesh, params, CFG)
    kv2 = shard_kv(init_kv_cache(HP, batch, s, dtype=jnp.float32), mesh)
    out_logits, _, _ = fn(sh_params, jnp.asarray(tokens), jnp.int32(0), kv2,
                          jnp.int32(seq - 1))
    return ref_logits, out_logits


@pytest.mark.parametrize("tp,dp", [(8, 1), (4, 2), (2, 1)])
def test_sharded_forward_matches_single_device(tp, dp):
    rng = np.random.default_rng(0)
    params = build_params(quantized=True, rng=rng)
    mesh = make_mesh(n_data=dp, n_model=tp)
    batch = 2 * dp
    ref, out = _run_pair(params, mesh, batch=batch, seq=5, s=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_forward_dense():
    rng = np.random.default_rng(1)
    params = build_params(quantized=False, rng=rng)
    mesh = make_mesh(n_data=1, n_model=4)
    ref, out = _run_pair(params, mesh, batch=1, seq=4, s=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_decode_continuation():
    """Prefill sharded, then a decode step — logits must track the
    single-device path."""
    rng = np.random.default_rng(2)
    params = build_params(quantized=True, rng=rng)
    mesh = make_mesh(n_data=1, n_model=8)
    s = 16
    tokens = np.array([[3, 7, 11]], np.int32)

    kv = init_kv_cache(HP, 1, s, dtype=jnp.float32)
    _, kv, _ = forward(params, jnp.asarray(tokens), jnp.int32(0), kv, CFG,
                       jnp.int32(2))
    ref, *_ = forward(params, jnp.asarray([[20]], np.int32), jnp.int32(3),
                      kv, CFG, jnp.int32(0))

    sh_params = shard_params(params, mesh)
    fn = make_sharded_forward(mesh, params, CFG)
    kv2 = shard_kv(init_kv_cache(HP, 1, s, dtype=jnp.float32), mesh)
    _, kv2, _ = fn(sh_params, jnp.asarray(tokens), jnp.int32(0), kv2,
                   jnp.int32(2))
    out, *_ = fn(sh_params, jnp.asarray([[20]], np.int32), jnp.int32(3),
                 kv2, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sharded_lora():
    """LoRA terms shard correctly and match single-device (one output-sharded
    target, one reduction-sharded target)."""
    rng = np.random.default_rng(3)
    params = build_params(quantized=True, rng=rng)
    d = HP.n_embd
    delta_q = (rng.standard_normal((d, d)) * 0.05).astype(np.float32)
    delta_o = (rng.standard_normal((d, d)) * 0.05).astype(np.float32)
    params.layers[0].lora_wq = LoraTerm(delta=jnp.asarray(delta_q))  # [K, N]
    params.layers[0].lora_wo = LoraTerm(delta=jnp.asarray(delta_o))
    mesh = make_mesh(n_data=1, n_model=4)
    ref, out = _run_pair(params, mesh, batch=1, seq=4, s=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
