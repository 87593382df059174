"""End-to-end token-stream parity against the ACTUAL reference binary
(VERDICT r4 #3): the same synthetic q4_0 GGJT checkpoint is decoded greedily
by (a) the built reference library through its own ctypes binding and (b)
this framework on CPU f32/HIGHEST — tying tokenizer + loader + dequant +
forward + sampling together in one observed comparison.

The reference computes quantized matmuls as int4 x int8 dots over q8_0
per-32-block-quantized activations (lib/ggml.c:8105-8119, 2368-3040); this
framework's bit-faithful path dequantizes exactly. The streams therefore
agree for a long prefix and eventually diverge where the activation-quant
noise crosses an argmax margin — measured: first divergence at token 15 of
48 on the worst-case random tiny model (recorded in BASELINE.md round-5).
The assert is the observed prefix with margin for toolchain variation.

Build the reference first (skipped otherwise):
    cp -r /root/reference /tmp/refsrc && cd /tmp/refsrc
    cmake -S . -B build -DPROJECT_NAME=fastllama -DCMAKE_BUILD_TYPE=Release \
        -DINTERFACES_python=ON && cmake --build build -j2
or point FASTLLAMA_REF_LIB at an existing pyfastllama.so directory.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from fastllama_tpu.io.ggml_writer import write_ggjt

from test_io import HP, build_tensors, tiny_vocab

REF_LIB_DIR = os.environ.get(
    "FASTLLAMA_REF_LIB", "/tmp/refsrc/build/interfaces/python")
REF_BINDING = "/root/reference/interfaces/python"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_LIB_DIR, "pyfastllama.so")),
    reason="reference pyfastllama.so not built (see module docstring)")

N_TOKENS = 48
PROMPT = " t1 t2"

# Driven in a subprocess: the reference library installs signal handlers and
# spins worker threads; keeping it out of the pytest process also means its
# ggml arena allocations (~2.8 GB of 7B-preset buffers even for the tiny
# model) are returned on exit.
_REF_DRIVER = r"""
import json, sys
import numpy as np
sys.path.insert(0, {binding!r})
import fastllama as ref
ref.set_library_path({libdir!r})
m = ref.Model(path={model!r}, num_threads=2, n_ctx=256)
assert m.ingest({prompt!r})
ids = []
for _ in range({n}):
    # each 1-token generate evals the pending token and samples from the
    # resulting logits; get_logits() still holds that row afterwards, so
    # its argmax IS the token greedy sampling just chose
    m.generate(num_tokens=1, temp=0.0, top_k=40, top_p=0.95,
               repeat_penalty=1.0, streaming_fn=lambda s: None)
    row = np.asarray(m.get_logits(), np.float32)
    tid = int(np.argmax(row))
    ids.append(tid)
    if tid == 2:
        break
print("IDS=" + json.dumps(ids))
"""


@pytest.fixture(scope="module")
def parity_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("parity") / "tiny.bin"
    write_ggjt(path, HP, tiny_vocab(), build_tensors(np.random.default_rng(11)))
    return str(path)


def _reference_stream(model_path: str) -> list[int]:
    src = _REF_DRIVER.format(binding=REF_BINDING, libdir=REF_LIB_DIR,
                             model=model_path, prompt=PROMPT, n=N_TOKENS)
    r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    for line in r.stdout.splitlines():
        # the reference logger interleaves ANSI color codes on stdout; the
        # marker may not start the line
        i = line.find("IDS=")
        if i >= 0:
            return json.loads(line[i + 4:])
    raise AssertionError(f"no IDS line in reference output:\n{r.stdout}")


def _our_stream(model_path: str) -> list[int]:
    from fastllama_tpu.api import Model
    from fastllama_tpu.engine.tokenizer import tokenize

    m = Model(model_path, n_ctx=256, weight_dtype="float32",
              kv_dtype="float32", use_pallas=False)
    lm = m._session.model
    # the reference's ingest prepends ' ' (lib/bridge.cpp:193); mirror it
    ids = tokenize(lm.vocab, " " + PROMPT, bos=True)
    row = lm.eval(0, ids)
    out = [int(np.argmax(row))]
    n_past = len(ids)
    for _ in range(N_TOKENS - 1):
        if out[-1] == 2:
            break
        row = lm.eval(n_past, [out[-1]])
        n_past += 1
        out.append(int(np.argmax(row)))
    return out


def test_greedy_stream_matches_reference_binary(parity_model):
    ids_ref = _reference_stream(parity_model)
    ids_our = _our_stream(parity_model)
    n = min(len(ids_ref), len(ids_our))
    assert n >= 32, (len(ids_ref), len(ids_our))
    div = next((i for i in range(n) if ids_ref[i] != ids_our[i]), n)
    # measured: 14 identical tokens before the reference's q8_0
    # activation-quant noise flips an argmax (random weights are the worst
    # case — near-uniform logit margins); the floor leaves margin for
    # compiler/toolchain variation in the reference build
    assert div >= 10, (div, ids_ref[:16], ids_our[:16])
