"""Sequence-parallel (long-context) tests on the virtual CPU mesh.

Ring-attention prefill and split-S decode over a sequence-sharded KV cache
(parallel/ring.py) must reproduce the single-device forward bit-for-bit up
to collective reduction order."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.models.llama import forward, init_kv_cache
from fastllama_tpu.parallel.sharding import (
    make_mesh, make_seq_parallel_forward, shard_kv_seq, shard_params,
)
from test_sharding import CFG, HP, build_params

TOL = dict(rtol=2e-4, atol=2e-4)


def _ref_prefill(params, tokens, s):
    kv = init_kv_cache(HP, tokens.shape[0], s, dtype=jnp.float32)
    return forward(params, jnp.asarray(tokens), jnp.int32(0), kv, CFG,
                   jnp.int32(tokens.shape[1] - 1))


@pytest.mark.parametrize("sp,tp", [(8, 1), (4, 2)])
def test_sp_prefill_matches_single_device(sp, tp):
    rng = np.random.default_rng(10)
    params = build_params(quantized=True, rng=rng)
    mesh = make_mesh(n_data=sp, n_model=tp)
    b, t, s = 1, 16, 16
    tokens = (np.arange(b * t, dtype=np.int32).reshape(b, t) * 7) % 200

    ref_logits, _, ref_emb = _ref_prefill(params, tokens, s)

    sh_params = shard_params(params, mesh)
    fn = make_seq_parallel_forward(mesh, params, CFG)
    kv = shard_kv_seq(init_kv_cache(HP, b, s, dtype=jnp.float32), mesh)
    out_logits, kv, out_emb = fn(sh_params, jnp.asarray(tokens), jnp.int32(0),
                                 kv, jnp.int32(t - 1))
    np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits),
                               **TOL)
    np.testing.assert_allclose(np.asarray(out_emb), np.asarray(ref_emb), **TOL)


def test_sp_prefill_then_decode_matches_single_device():
    """The sequence-sharded cache written by the ring must support decode:
    several continuation steps track the single-device logits, including
    steps whose token lands on a different sequence shard."""
    rng = np.random.default_rng(11)
    params = build_params(quantized=True, rng=rng)
    sp, tp = 4, 2
    mesh = make_mesh(n_data=sp, n_model=tp)
    b, t, s = 1, 8, 16                       # S_loc = 4: decode crosses shards
    tokens = (np.arange(b * t, dtype=np.int32).reshape(b, t) * 5 + 3) % 200

    kv_ref = init_kv_cache(HP, b, s, dtype=jnp.float32)
    ref, kv_ref, _ = forward(params, jnp.asarray(tokens), jnp.int32(0),
                             kv_ref, CFG, jnp.int32(t - 1))

    sh_params = shard_params(params, mesh)
    prefill = make_seq_parallel_forward(mesh, params, CFG)
    decode = make_seq_parallel_forward(mesh, params, CFG, decode=True)
    kv = shard_kv_seq(init_kv_cache(HP, b, s, dtype=jnp.float32), mesh)
    out, kv, _ = prefill(sh_params, jnp.asarray(tokens), jnp.int32(0), kv,
                         jnp.int32(t - 1))
    np.testing.assert_allclose(np.asarray(out)[:, -1], np.asarray(ref)[:, -1],
                               **TOL)

    # decode 6 steps: positions 8..13 span sequence shards 2 and 3
    for i, tok in enumerate([17, 42, 99, 7, 150, 63]):
        tarr = jnp.asarray([[tok]], jnp.int32)
        n_past = jnp.int32(t + i)
        ref_step, kv_ref, _ = forward(params, tarr, n_past, kv_ref, CFG,
                                      jnp.int32(0))
        out_step, kv, _ = decode(sh_params, tarr, n_past, kv, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out_step), np.asarray(ref_step),
                                   **TOL)


def test_sp_chunked_prefill_matches_single_device():
    """Windows arriving in n_batch-sized chunks (n_past > 0): the ring seeds
    its online softmax from the resident cache prefix, so chunked ingest
    must reproduce the single-shot logits at every position."""
    rng = np.random.default_rng(13)
    params = build_params(quantized=True, rng=rng)
    sp, tp = 4, 2
    mesh = make_mesh(n_data=sp, n_model=tp)
    b, t, s, chunk = 1, 24, 32, 8
    tokens = (np.arange(b * t, dtype=np.int32).reshape(b, t) * 11 + 2) % 200

    ref_logits, _, _ = _ref_prefill(params, tokens, s)

    sh_params = shard_params(params, mesh)
    fn = make_seq_parallel_forward(mesh, params, CFG, chunked=True)
    kv = shard_kv_seq(init_kv_cache(HP, b, s, dtype=jnp.float32), mesh)
    outs = []
    for c0 in range(0, t, chunk):
        out, kv, _ = fn(sh_params, jnp.asarray(tokens[:, c0:c0 + chunk]),
                        jnp.int32(c0), kv, jnp.int32(chunk - 1))
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(ref_logits), **TOL)


def test_sp_session_chunked_ingest_and_generate():
    """SP reachable from the product surface (VERDICT r2 #5): a FastLlama
    session over LlamaModel(rcfg.seq_parallel) whose prompt exceeds one
    shard's cache rows (S_loc = 8) must ingest through the normal n_batch
    loop and greedy-generate the same stream as the single-device session."""
    from fastllama_tpu.config import RuntimeConfig
    from fastllama_tpu.engine.session import FastLlama
    from fastllama_tpu.models.runtime import LlamaModel
    from test_session import tiny_vocab

    rng = np.random.default_rng(14)
    params = build_params(quantized=True, rng=rng)
    vocab = tiny_vocab(HP.n_vocab)
    # byte-fallback tokenization makes this ~37 tokens: > 2 sequence shards
    # (S_loc = 16) and > 4 n_batch ingest chunks
    prompt = " " + " ".join(f"w{i}" for i in range(1, 12))

    def run(mesh_shape, seq_parallel):
        rcfg = RuntimeConfig(n_ctx=64, n_batch=8, kv_dtype="float32",
                             weight_dtype="float32", use_pallas=False,
                             prefill_buckets=(8, 16, 32, 64),
                             mesh_shape=mesh_shape, seq_parallel=seq_parallel)
        model = LlamaModel(HP, params, vocab, rcfg)
        sess = FastLlama(model, n_keep=8, seed=3)
        assert sess.ingest(prompt)
        toks: list[str] = []
        assert sess.generate(toks.append, num_tokens=4, temp=0.0)
        return toks

    assert run((4, 2), True) == run((), False)


def test_sp_prefill_partial_window():
    """A prompt shorter than the context (T < S): the ring still writes every
    row to its owner and the last-token logits match (last_idx mid-window)."""
    rng = np.random.default_rng(12)
    params = build_params(quantized=True, rng=rng)
    mesh = make_mesh(n_data=4, n_model=1)
    b, t, s = 2, 8, 32                       # S_loc = 8, T_loc = 2
    tokens = (np.arange(b * t, dtype=np.int32).reshape(b, t) * 3 + 1) % 200

    ref_logits, _, _ = _ref_prefill(params, tokens, s)

    sh_params = shard_params(params, mesh)
    fn = make_seq_parallel_forward(mesh, params, CFG)
    kv = shard_kv_seq(init_kv_cache(HP, b, s, dtype=jnp.float32), mesh)
    out_logits, _, _ = fn(sh_params, jnp.asarray(tokens), jnp.int32(0), kv,
                          jnp.int32(t - 1))
    np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits),
                               **TOL)
