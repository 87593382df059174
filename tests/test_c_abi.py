"""C ABI end-to-end: build libfastllama_c.so (embedded CPython over the
session API), compile the C example against it, and drive a tiny GGJT model
from plain C in a subprocess — load, ingest, generate, logits view.

Mirrors the reference's C interface usage (interfaces/c/main.cpp) as the
acceptance bar. Skipped when the toolchain (g++/python3-config) is absent.
"""
import os
import shutil
import subprocess
import sysconfig
from pathlib import Path

import numpy as np
import pytest

from fastllama_tpu.io.ggml_writer import write_ggjt

from test_io import HP, build_tensors, tiny_vocab

REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "fastllama_tpu" / "native"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("python3-config") is None,
    reason="C toolchain not available")


@pytest.fixture(scope="module")
def c_abi_lib():
    r = subprocess.run(["make", "-C", str(NATIVE), "c_abi"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"libfastllama_c.so build failed:\n{r.stderr}")
    return NATIVE / "libfastllama_c.so"


@pytest.fixture(scope="module")
def c_demo(c_abi_lib, tmp_path_factory):
    out = tmp_path_factory.mktemp("cdemo") / "fl_demo"
    r = subprocess.run(
        ["gcc" if shutil.which("gcc") else "g++",
         str(REPO / "examples" / "c" / "main.c"),
         f"-I{NATIVE}", f"-L{NATIVE}", "-lfastllama_c", "-o", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, f"demo compile failed:\n{r.stderr}"
    return out


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    rng = np.random.default_rng(11)
    path = tmp_path_factory.mktemp("cckpt") / "tiny.bin"
    write_ggjt(path, HP, tiny_vocab(), build_tensors(rng))
    return str(path)


def _run_demo(c_demo, tiny_model, *extra):
    env = dict(os.environ)
    libdirs = [str(NATIVE), sysconfig.get_config_var("LIBDIR") or ""]
    if env.get("LD_LIBRARY_PATH"):
        libdirs.append(env["LD_LIBRARY_PATH"])
    env["LD_LIBRARY_PATH"] = ":".join(d for d in libdirs if d)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    # the embedded interpreter must pin JAX to CPU the same way
    # tests/conftest.py does (env JAX_PLATFORMS is overridden by the TPU
    # tunnel plugin; only the config update sticks)
    env["FASTLLAMA_C_INIT"] = (
        "import jax; jax.config.update('jax_platforms', 'cpu')")
    return subprocess.run(
        [str(c_demo), tiny_model, " t1 t2", *extra],
        capture_output=True, text=True, timeout=900, env=env)


def test_c_abi_generates(c_demo, tiny_model):
    r = _run_demo(c_demo, tiny_model, "4", "0")
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    # greedy decode on the tiny vocab must stream some text
    assert len(r.stdout.strip()) > 0
    # and the logits view must carry one vocab row
    assert f"logits: {HP.n_vocab} values" in r.stderr


@pytest.fixture(scope="module")
def c_ppl(c_abi_lib, tmp_path_factory):
    out = tmp_path_factory.mktemp("cppl") / "fl_ppl"
    r = subprocess.run(
        ["gcc" if shutil.which("gcc") else "g++",
         str(REPO / "examples" / "c" / "perplexity.c"),
         f"-I{NATIVE}", f"-L{NATIVE}", "-lfastllama_c", "-o", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, f"perplexity compile failed:\n{r.stderr}"
    return out


@pytest.fixture(scope="module")
def real_vocab_model(tmp_path_factory):
    """1-layer model at the REAL LLaMA vocab width (n_vocab=32000) so the
    C logits view is exercised at production row size (round-3 verdict #6;
    /root/reference/examples/c/perplexity.c:6-37 is the usage mirrored)."""
    from fastllama_tpu.io.ggml_reader import FType, HyperParams, Vocab
    from fastllama_tpu.quant.q4 import quantize_q4_0

    hp = HyperParams(n_vocab=32000, n_embd=64, n_mult=32, n_head=4,
                     n_layer=1, n_rot=16, ftype=FType.MOSTLY_Q4_0)
    rng = np.random.default_rng(13)
    d = hp.n_embd

    def q(out, inn, s=0.15):
        dense = (rng.standard_normal((out, inn)) * s).astype(np.float32)
        return ("q4_0",) + quantize_q4_0(dense)

    tensors = {
        "tok_embeddings.weight": q(hp.n_vocab, d, 0.4),
        "norm.weight": ("f32", np.ones(d, np.float32)),
        "output.weight": q(hp.n_vocab, d),
    }
    p = "layers.0."
    tensors[p + "attention_norm.weight"] = ("f32", np.ones(d, np.float32))
    for nm in ("wq", "wk", "wv", "wo"):
        tensors[p + f"attention.{nm}.weight"] = q(d, d)
    tensors[p + "ffn_norm.weight"] = ("f32", np.ones(d, np.float32))
    tensors[p + "feed_forward.w1.weight"] = q(hp.n_ff, d)
    tensors[p + "feed_forward.w2.weight"] = q(d, hp.n_ff)
    tensors[p + "feed_forward.w3.weight"] = q(hp.n_ff, d)

    toks = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    toks += [(bytes([i]), -1e6) for i in range(256)]
    toks += [(f" t{i}".encode(), 1.0) for i in range(hp.n_vocab - 259)]
    vocab = Vocab.from_tokens(toks)

    path = tmp_path_factory.mktemp("ckpt32k") / "real_vocab.bin"
    write_ggjt(path, hp, vocab, tensors)
    return str(path)


def test_c_abi_perplexity_real_vocab(c_ppl, real_vocab_model):
    """perplexity.c end-to-end at n_vocab=32000: the all-logits buffer from
    llama_get_logits must be n_positions*32000 wide and the argmax id (via
    llama_get_n_vocab) must be a valid vocab id asserted from C output."""
    env = dict(os.environ)
    libdirs = [str(NATIVE), sysconfig.get_config_var("LIBDIR") or ""]
    if env.get("LD_LIBRARY_PATH"):
        libdirs.append(env["LD_LIBRARY_PATH"])
    env["LD_LIBRARY_PATH"] = ":".join(d for d in libdirs if d)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["FASTLLAMA_C_INIT"] = (
        "import jax; jax.config.update('jax_platforms', 'cpu')")
    r = subprocess.run([str(c_ppl), real_vocab_model], capture_output=True,
                       text=True, timeout=900, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "perplexity: " in r.stdout
    import re
    m = re.search(r"logit view: (\d+) values, argmax id (\d+)", r.stdout)
    assert m, r.stdout
    n_values, argmax = int(m.group(1)), int(m.group(2))
    assert n_values % 32000 == 0 and n_values >= 32000
    assert 0 <= argmax < 32000


@pytest.fixture(scope="module")
def c_interrupt(c_abi_lib, tmp_path_factory):
    out = tmp_path_factory.mktemp("cint") / "fl_interrupt"
    r = subprocess.run(
        ["gcc" if shutil.which("gcc") else "g++",
         str(Path(__file__).resolve().parent / "_c_interrupt.c"),
         f"-I{NATIVE}", f"-L{NATIVE}", "-lfastllama_c", "-o", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, f"interrupt fixture compile failed:\n{r.stderr}"
    return out


def test_c_abi_handle_signal_stops_generate(c_interrupt, tiny_model):
    """llama_handle_signal mid-generate: the in-flight generate stops at the
    next token boundary and returns true; the flag is cleared by the next
    llama_generate, which runs unimpeded (reference analog: the handler
    exits the process, interfaces/c/main.cpp:229-232 — here the session
    stays resumable per the header contract)."""
    env = dict(os.environ)
    libdirs = [str(NATIVE), sysconfig.get_config_var("LIBDIR") or ""]
    if env.get("LD_LIBRARY_PATH"):
        libdirs.append(env["LD_LIBRARY_PATH"])
    env["LD_LIBRARY_PATH"] = ":".join(d for d in libdirs if d)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["FASTLLAMA_C_INIT"] = (
        "import jax; jax.config.update('jax_platforms', 'cpu')")
    n_req = 12
    r = subprocess.run([str(c_interrupt), tiny_model, " t1 t2", str(n_req)],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    import re
    m = re.search(r"chunks1=(\d+) chunks2=(\d+)", r.stdout)
    assert m, r.stdout
    chunks1, chunks2 = int(m.group(1)), int(m.group(2))
    # the signal lands after the first streamed chunk: the loop notices at
    # its next per-token poll, so far fewer than n_req tokens stream
    assert 1 <= chunks1 <= 3, (chunks1, chunks2)
    # the second generate must NOT be stopped by the spent flag (tiny-model
    # greedy decode may hit EOS early; "well past the interrupted count"
    # is the discriminating bound)
    assert chunks2 > chunks1, (chunks1, chunks2)


@pytest.fixture(scope="module")
def c_alpaca(c_abi_lib, tmp_path_factory):
    out = tmp_path_factory.mktemp("calpaca") / "fl_alpaca"
    r = subprocess.run(
        ["gcc" if shutil.which("gcc") else "g++",
         str(REPO / "examples" / "c" / "example-alpaca.c"),
         f"-I{NATIVE}", f"-L{NATIVE}", "-lfastllama_c", "-o", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, f"alpaca example compile failed:\n{r.stderr}"
    return out


def test_c_abi_alpaca_example(c_alpaca, tiny_model):
    """The alpaca REPL example end-to-end: one instruction line on stdin is
    wrapped in the Alpaca template, ingested, and answered (mirrors
    /root/reference/examples/c/example-alpaca.c usage)."""
    env = dict(os.environ)
    libdirs = [str(NATIVE), sysconfig.get_config_var("LIBDIR") or ""]
    if env.get("LD_LIBRARY_PATH"):
        libdirs.append(env["LD_LIBRARY_PATH"])
    env["LD_LIBRARY_PATH"] = ":".join(d for d in libdirs if d)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["FASTLLAMA_C_INIT"] = (
        "import jax; jax.config.update('jax_platforms', 'cpu')")
    r = subprocess.run([str(c_alpaca), tiny_model, "4", "0"],
                       input="t1 t2\n", capture_output=True, text=True,
                       timeout=900, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    # REPL prompt printed twice (before and after the turn) + streamed text
    assert r.stdout.count("User: ") == 2, r.stdout


def test_c_abi_greedy_matches_python_api(c_demo, tiny_model):
    """The C surface is a veneer: greedy text through the ABI equals greedy
    text through fastllama_tpu.Model on the same checkpoint."""
    from fastllama_tpu.api import Model

    r = _run_demo(c_demo, tiny_model, "4", "0")
    assert r.returncode == 0, r.stderr

    m = Model(tiny_model, n_ctx=512)
    m.ingest(" t1 t2")
    chunks = []
    assert m.generate(num_tokens=4, temp=0.0, top_k=40, top_p=0.95,
                      repeat_penalty=1.0, streaming_fn=chunks.append,
                      stop_words=["###"])
    assert r.stdout.rstrip("\n") == "".join(chunks)
