"""Large-model sharding configs (30B/65B dims) compile and run on the
virtual mesh — the single-process stand-in for BASELINE configs #4/#5
(real multi-chip hardware validates the same code path; layer count is
truncated to keep test wall-time sane, every per-layer shape is real)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastllama_tpu.config import HyperParams
from fastllama_tpu.models.llama import ForwardConfig, init_kv_cache
from fastllama_tpu.parallel.sharding import (
    make_mesh, make_sharded_forward, shard_kv, shard_params,
)

from __graft_entry__ import _build_model


@pytest.mark.parametrize("name,n_embd,n_head,n_ff,tp", [
    ("30B", 6656, 52, 17920, 4),
    ("65B", 8192, 64, 22016, 8),
])
def test_large_dims_shard_and_run(name, n_embd, n_head, n_ff, tp):
    hp = HyperParams(n_vocab=32000, n_embd=n_embd, n_head=n_head,
                     n_layer=2, n_rot=128)
    params = _build_model(hp, n_ff=n_ff, dtype_scale=0.01)
    mesh = make_mesh(n_data=1, n_model=tp)
    cfg = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot, use_pallas=False,
                        vocab_size=hp.n_vocab)
    sh = shard_params(params, mesh)
    fn = make_sharded_forward(mesh, params, cfg)
    kv = shard_kv(init_kv_cache(hp, 1, 64, dtype=jnp.float32), mesh)

    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits, kv, _ = fn(sh, toks, jnp.int32(0), kv, jnp.int32(3))
    assert np.isfinite(np.asarray(logits)).all()
    # one decode step continuing
    logits2, kv, _ = fn(sh, jnp.asarray([[7]], jnp.int32), jnp.int32(4), kv,
                        jnp.int32(0))
    assert logits2.shape == (1, 1, 32000)
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.mark.parametrize("kv_mode", ["slab", "paged"])
def test_65b_dims_engine_admit_and_decode(kv_mode):
    """BatchEngine admission + decode at 65B per-layer dims (n_embd=8192,
    n_ff=22016, 64 heads) under tp=8, slab AND paged: the full engine code
    path (prefill scatter, batched decode, on-device sampling) at BASELINE
    config #5's shapes, as far as a single process can validate it."""
    from fastllama_tpu.config import RuntimeConfig
    from fastllama_tpu.engine.scheduler import BatchEngine, Request
    from test_session import tiny_vocab

    # this test's 65B-dims arrays peak host memory; when the whole suite
    # runs in one process, ~200 prior tests leave GBs of compiled
    # executables + cached arrays behind (one full-suite run aborted here
    # with a host OOM while the test passes alone) — drop them first
    import gc
    import jax as _jax
    _jax.clear_caches()
    gc.collect()

    hp = HyperParams(n_vocab=32000, n_embd=8192, n_head=64, n_layer=2,
                     n_rot=128)
    params = _build_model(hp, n_ff=22016, dtype_scale=0.01)
    vocab = tiny_vocab(1024)
    rcfg = RuntimeConfig(use_pallas=False, prefill_buckets=(8,),
                         mesh_shape=(1, 8))
    eng = BatchEngine(hp, params, vocab, n_slots=2, n_ctx=16, rcfg=rcfg,
                      temp=0.0, kv_mode=kv_mode, page_size=8)
    req = Request(prompt="w3 w4", max_tokens=3)
    eng.run([req])
    assert req.done
    assert len(req.tokens_out) == 3
