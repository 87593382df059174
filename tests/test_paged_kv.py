"""Paged KV cache tests: allocator behavior and decode equivalence with the
slab cache."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams
from fastllama_tpu.engine.paged_kv import (
    PagedKVManager, paged_attention_reference, write_tokens_paged,
)
from fastllama_tpu.models.llama import (
    ForwardConfig, forward, forward_paged_decode, init_kv_cache,
)

from test_session import tiny_model  # fixture (n_embd=64, H=4, L=2)


def test_allocator_alloc_free():
    hp = HyperParams(n_vocab=64, n_embd=64, n_head=4, n_layer=2, n_rot=16)
    m = PagedKVManager(hp, n_slots=3, page_size=8, total_pages=6,
                       pages_per_seq=3, dtype=jnp.float32)
    assert m.free_pages == 6
    assert m.alloc_for(0, 1)          # 1 page
    assert m.alloc_for(0, 8)          # still 1 page
    assert m.alloc_for(0, 9)          # 2 pages
    assert m.free_pages == 4
    assert m.alloc_for(1, 24)         # 3 pages
    assert m.free_pages == 1
    assert not m.alloc_for(2, 16)     # needs 2, only 1 free -> OOM
    m.free_slot(1)
    assert m.free_pages == 4
    assert m.alloc_for(2, 16)


def test_allocator_pages_per_seq_cap():
    hp = HyperParams(n_vocab=64, n_embd=64, n_head=4, n_layer=2, n_rot=16)
    m = PagedKVManager(hp, n_slots=1, page_size=8, total_pages=16,
                       pages_per_seq=2, dtype=jnp.float32)
    assert m.alloc_for(0, 16)
    assert not m.alloc_for(0, 17)     # over the per-sequence cap


def test_token_page_offsets():
    hp = HyperParams(n_vocab=64, n_embd=64, n_head=4, n_layer=2, n_rot=16)
    m = PagedKVManager(hp, n_slots=1, page_size=4, total_pages=8,
                       pages_per_seq=4, dtype=jnp.float32)
    assert m.alloc_for(0, 10)
    pages, offs = m.token_page_offsets(0, 2, 6)   # tokens 2..7
    assert list(offs) == [2, 3, 0, 1, 2, 3]
    assert pages[0] == pages[1] == m.page_tables[0, 0]
    assert pages[2] == pages[5] == m.page_tables[0, 1]


def test_paged_write_and_reference_attention():
    rng = np.random.default_rng(0)
    h, d, ps, pages = 2, 8, 4, 6
    kp = jnp.zeros((h, pages, ps, d), jnp.float32)
    vp = jnp.zeros_like(kp)
    # one sequence of 5 tokens on pages [3, 1]
    table = jnp.asarray([[3, 1, 0]], jnp.int32)
    ks = rng.standard_normal((5, h, d)).astype(np.float32)
    vs = rng.standard_normal((5, h, d)).astype(np.float32)
    for t in range(5):
        pid = [3] if t < ps else [1]
        off = [t % ps]
        kp, vp = write_tokens_paged(kp, vp,
                                    jnp.asarray(ks[t][None, None]),
                                    jnp.asarray(vs[t][None, None]),
                                    jnp.asarray([pid], jnp.int32),
                                    jnp.asarray([off], jnp.int32))
    q = rng.standard_normal((1, h, d)).astype(np.float32)
    out = np.asarray(paged_attention_reference(
        jnp.asarray(q), kp, vp, jnp.asarray([5]), table))

    # dense oracle
    scores = np.einsum("hd,shd->hs", q[0], ks) / np.sqrt(d)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("hs,shd->hd", probs, vs)
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-5)


def test_paged_kv_write_kernel_matches_scatter():
    """The in-place Pallas write (kernels/kv_write.py, interpret mode here)
    must produce the same pools as the XLA scatter fallback on every real
    page, with sentinel writes landing only in the trash page."""
    from fastllama_tpu.kernels.kv_write import paged_kv_write

    rng = np.random.default_rng(3)
    h, p, ps, d = 4, 5, 16, 128        # page 4 = trash (sentinel id)
    b = 3
    kp = jnp.asarray(rng.standard_normal((h, p, ps, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((h, p, ps, d)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    pids = jnp.asarray([1, 3, 4], jnp.int32)     # slot 2 inactive -> trash
    offs = jnp.asarray([9, 3, 7], jnp.int32)

    want_k, want_v = write_tokens_paged(
        kp, vp, k_new[:, None], v_new[:, None], pids[:, None], offs[:, None])
    got_k, got_v = paged_kv_write(kp, vp, k_new, v_new, pids, offs,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k)[:, :4],
                                  np.asarray(want_k)[:, :4])
    np.testing.assert_array_equal(np.asarray(got_v)[:, :4],
                                  np.asarray(want_v)[:, :4])
    # rows 9 of page 1 / 3 of page 3 hold the new vectors
    np.testing.assert_array_equal(np.asarray(got_k)[:, 1, 9], np.asarray(k_new[0]))
    np.testing.assert_array_equal(np.asarray(got_v)[:, 3, 3], np.asarray(v_new[1]))


def test_paged_attention_kernel_matches_reference():
    """The own fused page-gather kernel (kernels/paged_attention.py,
    interpret mode here) must reproduce the jnp reference over ragged
    lengths, non-contiguous page tables, and head grouping."""
    import fastllama_tpu.kernels.paged_attention as pa
    from fastllama_tpu.kernels.paged_attention import (
        paged_attn_supported, paged_decode_attention,
    )

    rng = np.random.default_rng(7)
    h, d, ps, pages, pp, b = 4, 128, 8, 16, 4, 3
    assert paged_attn_supported(h, pp, ps, d, 4)
    kp = jnp.asarray(rng.standard_normal((h, pages, ps, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((h, pages, ps, d)), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(pages)[: b * pp].reshape(b, pp), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    lengths = jnp.asarray([5, 1, 32], jnp.int32)   # partial / single / full

    want = np.asarray(paged_attention_reference(q, kp, vp, lengths, tables))
    got = np.asarray(paged_decode_attention(q, kp, vp, lengths, tables,
                                            interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # force g < h so the head-group path (strided pool DMAs at h0 > 0,
    # multi-cell scratch reuse) is exercised too
    assert pa.paged_attn_group(h, pp, ps, d, 4) == h
    got2 = np.asarray(paged_decode_attention(q, kp, vp, lengths, tables,
                                             group_size=2, interpret=True))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)


def test_paged_decode_matches_slab(tiny_model):
    """Prefill on the slab cache, mirror that KV into pages, then one decode
    step each way — logits must match."""
    hp = tiny_model.hp
    cfg = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot, w_dtype="float32",
                        act_dtype="float32", use_pallas=False)
    prompt = np.array([[1, 5, 9, 20, 7]], np.int32)
    t0 = prompt.shape[1]
    s = 16

    kv = init_kv_cache(hp, 1, s, dtype=jnp.float32)
    _, kv, _ = forward(tiny_model.params, jnp.asarray(prompt), jnp.int32(0),
                       kv, cfg, jnp.int32(t0 - 1))
    tok = jnp.asarray([[11]], jnp.int32)
    ref_logits, kv2, _ = forward(tiny_model.params, tok, jnp.int32(t0), kv, cfg)

    # build pages and copy the slab prefix in
    ps = 4
    mgr = PagedKVManager(hp, n_slots=1, page_size=ps, total_pages=8,
                         pages_per_seq=4, dtype=jnp.float32)
    assert mgr.alloc_for(0, t0 + 1)
    pages, offs = mgr.token_page_offsets(0, 0, t0)
    for li in range(hp.n_layer):
        k_slab = np.asarray(kv[li][0])[0, :t0].reshape(t0, hp.n_head, -1)
        v_slab = np.asarray(kv[li][1])[0, :t0].reshape(t0, hp.n_head, -1)
        mgr.k_pages[li], mgr.v_pages[li] = write_tokens_paged(
            mgr.k_pages[li], mgr.v_pages[li],
            jnp.asarray(k_slab[None]), jnp.asarray(v_slab[None]),
            jnp.asarray(pages[None]), jnp.asarray(offs[None]))

    wpages, woffs = mgr.token_page_offsets(0, t0, 1)
    paged_logits, _, _ = forward_paged_decode(
        tiny_model.params, tok, jnp.asarray([t0], jnp.int32),
        jnp.asarray(mgr.page_tables), mgr.k_pages, mgr.v_pages,
        jnp.asarray(wpages, jnp.int32), jnp.asarray(woffs, jnp.int32), cfg)

    np.testing.assert_allclose(np.asarray(paged_logits),
                               np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_paged_engine_applies_lora(tiny_model):
    """Attention/FFN LoRA terms must flow through the paged forward exactly
    like the slab forward (they were silently dropped in the paged
    attention projections before this test existed)."""
    import dataclasses as dc
    from fastllama_tpu.engine.scheduler import BatchEngine, Request
    from fastllama_tpu.models.llama import LoraTerm

    rng = np.random.default_rng(11)
    hp, vocab, rcfg = tiny_model.hp, tiny_model.vocab, tiny_model.rcfg
    d = hp.n_embd
    layers = []
    for li, layer in enumerate(tiny_model.params.layers):
        delta = jnp.asarray(
            (rng.standard_normal((d, d)) * 0.05).astype(np.float32))
        layers.append(dc.replace(layer, lora_wq=LoraTerm(delta=delta),
                                 lora_wo=LoraTerm(delta=delta * 0.5)))
    params = dc.replace(tiny_model.params, layers=layers)

    def run(mode):
        eng = BatchEngine(hp, params, vocab, n_slots=2, n_ctx=64, rcfg=rcfg,
                          kv_mode=mode, page_size=8, temp=0.0)
        res = eng.run([Request(prompt=" w1 w2 w3", max_tokens=5, temp=0.0),
                       Request(prompt=" w5 w6", max_tokens=5, temp=0.0)])
        return [r.tokens_out for r in res]

    assert run("paged") == run("slab")


def test_paged_attention_double_buffer_matches_single():
    """The double-buffered page-gather kernel (default when two scratch
    banks fit VMEM) is bit-identical to the single-buffer path (round-5
    kernel; the banks alternate per grid cell)."""
    import jax.numpy as jnp
    from fastllama_tpu.kernels.paged_attention import (
        paged_attn_group, paged_decode_attention)
    rng = np.random.default_rng(0)
    b, h, d, ps, pp = 4, 8, 128, 16, 4
    p = b * pp + 1
    kp = jnp.asarray(rng.standard_normal((h, p, ps, d)).astype(np.float32) * .3)
    vp = jnp.asarray(rng.standard_normal((h, p, ps, d)).astype(np.float32) * .3)
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    lengths = jnp.asarray(np.array([5, 16, 33, 64], np.int32))
    tables = jnp.asarray(np.arange(b * pp, dtype=np.int32).reshape(b, pp))
    assert paged_attn_group(h, pp, ps, d, 4, banks=2) is not None
    y_db = paged_decode_attention(q, kp, vp, lengths, tables, interpret=True)
    y_sb = paged_decode_attention(q, kp, vp, lengths, tables, group_size=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(y_db), np.asarray(y_sb),
                               rtol=1e-6, atol=1e-6)


def test_bulk_page_write_kernel_matches_scatter():
    """paged_kv_write_rows (the chunked-admission activation writer) must
    equal the XLA scatter for whole-page row blocks."""
    import jax.numpy as jnp
    from fastllama_tpu.engine.paged_kv import write_tokens_paged
    from fastllama_tpu.kernels.kv_write import paged_kv_write_rows
    rng = np.random.default_rng(1)
    h, p, ps, d = 4, 6, 8, 128
    kp0 = rng.standard_normal((h, p, ps, d)).astype(np.float32)
    vp0 = rng.standard_normal((h, p, ps, d)).astype(np.float32)
    t = 24
    rows_k = rng.standard_normal((t, h * d)).astype(np.float32)
    rows_v = rng.standard_normal((t, h * d)).astype(np.float32)
    block_pages = np.array([2, 0, 4], np.int32)
    k1, v1 = paged_kv_write_rows(jnp.asarray(kp0), jnp.asarray(vp0),
                                 jnp.asarray(rows_k), jnp.asarray(rows_v),
                                 jnp.asarray(block_pages), interpret=True)
    pages = np.repeat(block_pages, ps)[None, :]
    offs = np.tile(np.arange(ps, dtype=np.int32), 3)[None, :]
    k2, v2 = write_tokens_paged(jnp.asarray(kp0), jnp.asarray(vp0),
                                jnp.asarray(rows_k).reshape(1, t, h, d),
                                jnp.asarray(rows_v).reshape(1, t, h, d),
                                jnp.asarray(pages), jnp.asarray(offs))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
