"""Continuous-batching engine tests on the tiny model."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams, RuntimeConfig
from fastllama_tpu.engine.scheduler import BatchEngine, Request
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.models.runtime import LlamaModel

from test_session import tiny_model, tiny_vocab  # fixtures


RCFG = RuntimeConfig(kv_dtype="float32", weight_dtype="float32",
                     use_pallas=False, prefill_buckets=(8, 16, 32, 64))


def make_engine(tiny_model, n_slots=4, **kw):
    return BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                       n_slots=n_slots, n_ctx=64, rcfg=RCFG, **kw)


def test_paged_engine_matches_slab(tiny_model):
    """Greedy decode through the paged engine follows the slab engine."""
    slab = make_engine(tiny_model, temp=0.0)
    r1 = Request(prompt="w3 w4 w5", max_tokens=5)
    slab.run([r1])

    paged = make_engine(tiny_model, temp=0.0, kv_mode="paged", page_size=8)
    r2 = Request(prompt="w3 w4 w5", max_tokens=5)
    paged.run([r2])
    n = min(3, len(r1.text), len(r2.text))
    assert r2.text[:n] == r1.text[:n]


def test_paged_engine_concurrent_and_page_reuse(tiny_model):
    eng = make_engine(tiny_model, n_slots=3, temp=0.7, kv_mode="paged",
                      page_size=8, total_pages=12)
    reqs = [Request(prompt=f"w{i} w{i+2}", max_tokens=4) for i in range(6)]
    eng.run(reqs)
    assert all(r.done for r in reqs)
    # all pages returned to the pool after completion
    assert eng.pager.free_pages == 12


def test_paged_engine_oom_finishes_gracefully(tiny_model):
    # 2 pages of 8 tokens = 16-token pool; a 5-token prompt + 4 generated
    # fits, but two concurrent requests exhaust it
    eng = make_engine(tiny_model, n_slots=2, temp=0.7, kv_mode="paged",
                      page_size=8, total_pages=2)
    reqs = [Request(prompt="w1 w2 w3 w4", max_tokens=6) for _ in range(2)]
    eng.run(reqs)
    assert all(r.done for r in reqs)


def test_single_request(tiny_model):
    eng = make_engine(tiny_model, temp=0.0)
    req = Request(prompt="w1 w2", max_tokens=6)
    eng.run([req])
    assert req.done
    assert len(req.tokens_out) >= 1


def test_concurrent_requests_complete(tiny_model):
    eng = make_engine(tiny_model, n_slots=4, temp=0.8)
    reqs = [Request(prompt=f"w{i} w{i+1}", max_tokens=5) for i in range(6)]
    eng.run(reqs)   # 6 requests through 4 slots -> queueing exercised
    assert all(r.done for r in reqs)
    assert all(len(r.tokens_out) >= 1 for r in reqs)


def test_vector_npast_scatter_matches_individual_rows(tiny_model):
    """The batched decode math: forward with per-row n_past + scatter KV must
    equal running each row through its own single-stream forward."""
    import jax
    from fastllama_tpu.models.llama import ForwardConfig, forward, init_kv_cache
    hp = tiny_model.hp
    cfg_s = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot, w_dtype="float32",
                          act_dtype="float32", use_pallas=False,
                          kv_update="scatter")
    b, s_len = 3, 16
    prompts = [[1, 5, 9], [2, 7], [4]]

    # individual: prefill each prompt separately then one decode step
    refs = []
    for p in prompts:
        kv = init_kv_cache(hp, 1, s_len, dtype=jnp.float32)
        _, kv, _ = forward(tiny_model.params, jnp.asarray([p], jnp.int32),
                           jnp.int32(0), kv, cfg_s, jnp.int32(len(p) - 1))
        lg, kv, _ = forward(tiny_model.params, jnp.asarray([[11]], jnp.int32),
                            jnp.int32(len(p)), kv, cfg_s)
        refs.append(np.asarray(lg)[0, -1])

    # batched: pad prompts into one [B, T] prefill with per-row n_past=0,
    # then one [B, 1] decode at per-row depths
    t = 3
    toks = np.zeros((b, t), np.int32)
    for i, p in enumerate(prompts):
        toks[i, :len(p)] = p
    # per-row prefill must write each row's K/V only up to its own length:
    # run rows at staggered offsets is not needed — padded positions within
    # range get overwritten by the decode step only at the right row depth,
    # but garbage KV at [len(p), t) would corrupt attention. So prefill rows
    # individually here too, into one shared batched cache.
    kv = init_kv_cache(hp, b, s_len, dtype=jnp.float32)
    n_ctx_oob = s_len + 8
    for i, p in enumerate(prompts):
        row_past = np.full((b,), n_ctx_oob, np.int32)
        row_past[i] = 0
        row_toks = np.zeros((b, t), np.int32)
        row_toks[i, :len(p)] = p
        _, kv, _ = forward(tiny_model.params, jnp.asarray(row_toks),
                           jnp.asarray(row_past), kv, cfg_s,
                           jnp.int32(len(p) - 1))
    npast = jnp.asarray([len(p) for p in prompts], jnp.int32)
    lg, kv, _ = forward(tiny_model.params,
                        jnp.asarray([[11]] * b, jnp.int32), npast, kv, cfg_s)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(lg)[i, -1], refs[i],
                                   rtol=2e-4, atol=2e-4)


def test_batched_greedy_tracks_single_stream_prefix(tiny_model):
    """Greedy decode through the batch engine should follow the single-stream
    session (exact equality can flip on argmax near-ties from different
    matmul tilings; require a matching prefix)."""
    prompt = "w3 w4 w5"

    tiny_model.reset()
    s = FastLlama(tiny_model, n_keep=24, seed=0)
    assert s.ingest(" " + prompt)
    chunks = []
    s.generate(chunks.append, num_tokens=5, temp=0.0)
    single_text = "".join(chunks)

    eng = make_engine(tiny_model, temp=0.0)
    req = Request(prompt=prompt, max_tokens=5)
    eng.run([req])
    n = min(3, len(req.text), len(single_text))
    assert req.text[:n] == single_text[:n]


def test_batched_isolation(tiny_model):
    """A slot's output must not depend on what other slots are doing:
    greedy decode alone vs. alongside three other requests."""
    eng1 = make_engine(tiny_model, temp=0.0)
    alone = Request(prompt="w7 w8", max_tokens=5)
    eng1.run([alone])

    eng2 = make_engine(tiny_model, temp=0.0)
    together = Request(prompt="w7 w8", max_tokens=5)
    others = [Request(prompt=f"w{i}", max_tokens=5) for i in (1, 2, 3)]
    eng2.run([together] + others)
    assert together.text == alone.text


def test_per_request_temp_honored(tiny_model):
    """A temp=0 request inside a hot-temperature engine decodes greedily
    (deterministic across runs), while engine-temp requests stay stochastic."""
    outs = []
    for _ in range(2):
        eng = make_engine(tiny_model, temp=0.9)
        greedy = Request(prompt="w2 w4", max_tokens=5, temp=0.0)
        hot = Request(prompt="w2 w4", max_tokens=5)
        eng.run([greedy, hot])
        outs.append(greedy.text)
    assert outs[0] == outs[1]


def test_admit_does_not_inherit_previous_lastn(tiny_model):
    """A new request in a reused slot must not be repetition-penalized by the
    previous occupant's token window (greedy + penalty => deterministic)."""
    eng = make_engine(tiny_model, n_slots=1, temp=0.0, repeat_penalty=1.5)
    first = Request(prompt="w1 w2", max_tokens=6)
    eng.run([first])
    reused = Request(prompt="w5 w6", max_tokens=6)
    eng.run([reused])

    eng2 = make_engine(tiny_model, n_slots=1, temp=0.0, repeat_penalty=1.5)
    fresh = Request(prompt="w5 w6", max_tokens=6)
    eng2.run([fresh])
    assert reused.text == fresh.text


def test_per_request_topk_topp_penalty(tiny_model):
    """Per-request sampling knobs are honored per slot: top_k=1 and a tiny
    top_p are both greedy-equivalent regardless of temperature, so two such
    requests running concurrently inside a hot-temperature engine must both
    reproduce the plain greedy stream."""
    ref_eng = make_engine(tiny_model, temp=0.0)
    ref = Request(prompt="w3 w4", max_tokens=5)
    ref_eng.run([ref])

    eng = make_engine(tiny_model, n_slots=4, temp=0.9)
    via_topk = Request(prompt="w3 w4", max_tokens=5, temp=0.9, top_k=1)
    via_topp = Request(prompt="w3 w4", max_tokens=5, temp=0.9, top_p=1e-6)
    noise = [Request(prompt=f"w{i}", max_tokens=5) for i in (1, 2)]
    eng.run([via_topk, via_topp] + noise)
    assert via_topk.text == ref.text
    assert via_topp.text == ref.text


def test_per_request_repeat_penalty(tiny_model):
    """Greedy + per-request penalty is deterministic; a penalized request and
    an unpenalized one must match their single-request counterparts even when
    they share a batch."""
    eng_pen = make_engine(tiny_model, temp=0.0, repeat_penalty=1.0)
    alone = Request(prompt="w1 w2", max_tokens=6, repeat_penalty=1.8)
    eng_pen.run([alone])
    eng_plain = make_engine(tiny_model, temp=0.0)
    plain_alone = Request(prompt="w1 w2", max_tokens=6)
    eng_plain.run([plain_alone])

    eng = make_engine(tiny_model, n_slots=2, temp=0.0)
    pen = Request(prompt="w1 w2", max_tokens=6, repeat_penalty=1.8)
    plain = Request(prompt="w1 w2", max_tokens=6)
    eng.run([pen, plain])
    assert pen.text == alone.text
    assert plain.text == plain_alone.text


def test_async_drain_matches_sync(tiny_model):
    """drain_depth > 0 (pipelined host readback) must not change any stream:
    greedy outputs at depth 3 equal depth 0, including slot reuse."""
    outs = {}
    for depth in (0, 3):
        eng = make_engine(tiny_model, n_slots=2, temp=0.0,
                          drain_depth=depth, repeat_penalty=1.2)
        reqs = [Request(prompt=f"w{i} w{i+1}", max_tokens=5)
                for i in range(5)]
        eng.run(reqs)
        assert all(r.done for r in reqs)
        outs[depth] = [r.text for r in reqs]
    assert outs[0] == outs[3]


def test_async_drain_stochastic_deterministic(tiny_model):
    """Sampled decode through the async drain stays seed-deterministic and
    depth-independent (the PRNG folds the device step counter, which does
    not depend on when the host reads tokens back)."""
    outs = {}
    for depth in (0, 2):
        eng = make_engine(tiny_model, temp=0.8, drain_depth=depth,
                          sampling_seed=5)
        reqs = [Request(prompt="w2 w3", max_tokens=6)]
        eng.run(reqs)
        outs[depth] = reqs[0].text
    assert outs[0] == outs[2]


def test_max_tokens_respected(tiny_model):
    eng = make_engine(tiny_model, temp=0.9)
    req = Request(prompt="w1", max_tokens=3)
    eng.run([req])
    assert req.done
    assert len(req.tokens_out) <= 3


def test_prompt_too_long_rejected(tiny_model):
    eng = make_engine(tiny_model, temp=0.5)
    req = Request(prompt=" ".join(f"w{i % 9}" for i in range(80)), max_tokens=3)
    eng.run([req])
    assert req.done and req.text == ""


def test_chunked_admission_matches_monolithic(tiny_model):
    """Chunked admission partitions only the prefill's QUERY rows, so in
    f32 the greedy streams must be identical to the monolithic engine's
    (VERDICT r4 #4 — the session ingest-loop semantics applied to the
    engine). n_batch=8 over a ~9-token prompt exercises multiple chunks
    incl. a padded final one."""
    import dataclasses
    rcfg = dataclasses.replace(RCFG, n_batch=8)
    mono = BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                       n_slots=4, n_ctx=64, rcfg=rcfg, temp=0.0)
    reqs_m = [Request(prompt=f"w{i} w{i+1} w{i+2} w{i+3}", max_tokens=5)
              for i in range(5)]
    mono.run(reqs_m)

    chk = BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                      n_slots=4, n_ctx=64, rcfg=rcfg, temp=0.0,
                      chunked_admission=True)
    assert chk.chunked_admission
    reqs_c = [Request(prompt=f"w{i} w{i+1} w{i+2} w{i+3}", max_tokens=5)
              for i in range(5)]
    chk.run(reqs_c)
    for rm, rc in zip(reqs_m, reqs_c):
        assert rc.tokens_out == rm.tokens_out, (rm.text, rc.text)


def test_chunked_admission_single_chunk_prompt(tiny_model):
    """A prompt shorter than one chunk takes the single-padded-chunk path."""
    eng = make_engine(tiny_model, temp=0.0, chunked_admission=True)
    req = Request(prompt="w1 w2", max_tokens=6)
    eng.run([req])
    assert req.done and len(req.tokens_out) >= 1


def test_chunked_admission_mid_run(tiny_model):
    """A request submitted while others decode is admitted chunk by chunk
    and completes; earlier requests are unaffected."""
    eng = make_engine(tiny_model, n_slots=2, temp=0.0,
                      chunked_admission=True)
    first = Request(prompt="w1 w2 w3", max_tokens=8)
    eng.submit(first)
    for _ in range(4):
        eng.step()
    late = Request(prompt="w5 w6 w7 w8 w9 w10 w11 w12 w13", max_tokens=4)
    eng.submit(late)
    while not (first.done and late.done):
        eng.step()
    assert len(first.tokens_out) >= 1 and len(late.tokens_out) >= 1


def test_chunked_admission_paged_matches_monolithic(tiny_model):
    """Paged chunked admission (round 5): chunks run on the private slab
    row, then one write_tokens_paged pass scatters the rows into the
    slot's pages — greedy streams must equal the monolithic paged
    engine's in f32."""
    import dataclasses
    rcfg = dataclasses.replace(RCFG, n_batch=8)
    mono = BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                       n_slots=4, n_ctx=64, rcfg=rcfg, temp=0.0,
                       kv_mode="paged", page_size=8)
    reqs_m = [Request(prompt=f"w{i} w{i+1} w{i+2} w{i+3}", max_tokens=5)
              for i in range(5)]
    mono.run(reqs_m)

    chk = BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                      n_slots=4, n_ctx=64, rcfg=rcfg, temp=0.0,
                      kv_mode="paged", page_size=8, chunked_admission=True)
    assert chk.chunked_admission
    reqs_c = [Request(prompt=f"w{i} w{i+1} w{i+2} w{i+3}", max_tokens=5)
              for i in range(5)]
    chk.run(reqs_c)
    for rm, rc in zip(reqs_m, reqs_c):
        assert rc.tokens_out == rm.tokens_out, (rm.text, rc.text)


def test_chunked_admission_paged_oom_finishes(tiny_model):
    """Page-pool exhaustion at the activation scatter finishes the request
    gracefully instead of wedging the admission state machine."""
    eng = make_engine(tiny_model, n_slots=2, temp=0.7, kv_mode="paged",
                      page_size=8, total_pages=2, chunked_admission=True)
    reqs = [Request(prompt="w1 w2 w3 w4", max_tokens=6) for _ in range(2)]
    eng.run(reqs)
    assert all(r.done for r in reqs)
