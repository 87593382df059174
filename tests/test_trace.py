"""Tracing hooks (utils/trace.py): RuntimeConfig.profile_dir drops
jax.profiler traces around session/engine hot regions — the TPU-native
replacement for ggml's perf counters + graph_print (SURVEY §5)."""
import dataclasses
import os

import pytest

from fastllama_tpu.engine.scheduler import BatchEngine, Request
from fastllama_tpu.engine.session import FastLlama
from fastllama_tpu.utils.trace import device_op_breakdown, trace_region
from test_session import tiny_model  # noqa: F401  (fixture)


def test_trace_region_disabled_is_noop(tmp_path):
    with trace_region("", "x"):
        pass
    with trace_region(None, "x"):
        pass
    assert not list(tmp_path.iterdir())


def test_session_generate_traced(tiny_model, tmp_path):  # noqa: F811
    tiny_model.reset()
    tiny_model.rcfg = dataclasses.replace(
        tiny_model.rcfg, profile_dir=str(tmp_path))
    try:
        s = FastLlama(tiny_model, n_keep=24, seed=7)
        assert s.ingest(" w1 w2")
        out = []
        assert s.generate(out.append, num_tokens=3, temp=0.0)
        total, agg, cnt = device_op_breakdown(str(tmp_path / "generate"))
        assert sum(cnt.values()) > 0          # events captured and parsed
    finally:
        tiny_model.rcfg = dataclasses.replace(tiny_model.rcfg, profile_dir="")


def test_engine_run_traced(tiny_model, tmp_path):  # noqa: F811
    rcfg = dataclasses.replace(tiny_model.rcfg, profile_dir=str(tmp_path))
    eng = BatchEngine(tiny_model.hp, tiny_model.params, tiny_model.vocab,
                      n_slots=2, n_ctx=64, rcfg=rcfg, temp=0.0)
    res = eng.run([Request(prompt=" w1", max_tokens=3, temp=0.0)])
    assert len(res[0].tokens_out) == 3
    assert os.path.isdir(tmp_path / "engine_run")
    total, agg, cnt = device_op_breakdown(str(tmp_path / "engine_run"))
    assert sum(cnt.values()) > 0


def test_breakdown_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        device_op_breakdown(str(tmp_path))
