#!/usr/bin/env python
"""Measure the reference fastLLaMa's decode throughput on this machine.

Builds a synthetic LLaMA-7B q4_0 GGJT checkpoint (random codes/scales — decode
speed is weight-content-independent), loads it through the reference's own
Python ctypes binding against the locally built pyfastllama.so, times greedy
generation, and writes baseline_ref.json for bench.py's vs_baseline.

    python tools/bench_reference.py --lib /tmp/refbuild/interfaces/python/pyfastllama.so \
        --model /tmp/ref7b.bin [--gen-model] [--num-tokens 32]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fastllama_tpu.config import FType, HyperParams
from fastllama_tpu.engine.tokenizer import Vocab
from fastllama_tpu.io.ggml_writer import write_ggjt


def gen_model(path: str) -> None:
    hp = HyperParams(n_vocab=32000, n_ctx=512, n_embd=4096, n_mult=256,
                     n_head=32, n_layer=32, n_rot=128,
                     ftype=FType.MOSTLY_Q4_0)
    rng = np.random.default_rng(0)
    toks = [(b"<unk>", 0.0), (b"<s>", 0.0), (b"</s>", 0.0)]
    toks += [(bytes([i]), -1e6) for i in range(256)]
    toks += [(f" t{i}".encode(), 1.0) for i in range(hp.n_vocab - 259)]
    vocab = Vocab.from_tokens(toks)

    def q4(n, k, scale=0.02):
        codes = rng.integers(1, 16, (n, k), dtype=np.uint8)
        scales = rng.uniform(1e-3, scale, (n, k // 32)).astype(np.float32)
        return ("q4_0", codes, scales)

    d, nff = hp.n_embd, hp.n_ff
    tensors = {
        "tok_embeddings.weight": q4(hp.n_vocab, d),
        "norm.weight": ("f32", np.ones(d, np.float32)),
        "output.weight": q4(hp.n_vocab, d),
    }
    for i in range(hp.n_layer):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = ("f32", np.ones(d, np.float32))
        for w in ("wq", "wk", "wv", "wo"):
            tensors[p + f"attention.{w}.weight"] = q4(d, d)
        tensors[p + "ffn_norm.weight"] = ("f32", np.ones(d, np.float32))
        tensors[p + "feed_forward.w1.weight"] = q4(nff, d)
        tensors[p + "feed_forward.w2.weight"] = q4(d, nff)
        tensors[p + "feed_forward.w3.weight"] = q4(nff, d)
        print(f"\rlayer {i + 1}/{hp.n_layer}", end="", flush=True)
    print("\nwriting GGJT ...")
    write_ggjt(path, hp, vocab, tensors)
    print(f"wrote {path} ({os.path.getsize(path) / 1e9:.2f} GB)")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lib", required=True, help="path to pyfastllama.so")
    ap.add_argument("--model", default="/tmp/ref7b.bin")
    ap.add_argument("--gen-model", action="store_true")
    ap.add_argument("--num-tokens", type=int, default=32)
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "baseline_ref.json"))
    args = ap.parse_args()

    if args.gen_model or not os.path.exists(args.model):
        gen_model(args.model)

    # Load the reference's own binding against the built library.
    sys.path.insert(0, "/root/reference/interfaces/python")
    import fastllama as ref_fastllama  # noqa
    ref_fastllama.set_library_path(str(Path(args.lib).parent))

    model = ref_fastllama.Model(
        path=args.model, num_threads=args.threads, n_ctx=512,
        should_get_all_logits=False)

    assert model.ingest("Hello world, this is a benchmark of"), "ingest failed"

    count = [0]

    def cb(s):
        count[0] += 1

    t0 = time.time()
    model.generate(num_tokens=args.num_tokens, temp=0.0, streaming_fn=cb)
    dt = time.time() - t0
    tps = args.num_tokens / dt
    print(f"reference: {args.num_tokens} tokens in {dt:.2f}s -> {tps:.2f} tok/s")

    with open(args.out, "w") as f:
        json.dump({"tokens_per_sec": round(tps, 3),
                   "source": f"measured reference build on this host "
                             f"({args.threads} threads)",
                   "num_tokens": args.num_tokens}, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
