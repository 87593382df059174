"""Capture a profiler trace of the 7B decode step and print the per-op
time breakdown (grouped by op kind) from the trace events.

Usage: python tools/profile_decode.py [--steps 8] [--out /tmp/prof]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/prof_decode")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dims", default="7b", choices=("7b", "13b"),
                    help="model dims (weights are synthetic either way)")
    ap.add_argument("--layers", type=int, default=0,
                    help="override n_layer (0 = the family's real depth)")
    ap.add_argument("--hlo", default="",
                    help="also dump the compiled step's HLO to this path")
    ap.add_argument("--copt", action="append", default=[],
                    help="XLA compiler option key=value (repeatable), "
                         "passed to jax.jit(compiler_options=...)")
    args = ap.parse_args()

    from fastllama_tpu.config import HyperParams
    from fastllama_tpu.models.llama import (
        ForwardConfig, forward, init_kv_cache,
    )
    from __graft_entry__ import _build_model

    if args.dims == "13b":
        hp = HyperParams(n_vocab=32000, n_embd=5120, n_head=40, n_layer=40,
                         n_rot=128)
        n_ff = 13824
    else:
        hp = HyperParams(n_vocab=32000, n_embd=4096, n_head=32, n_layer=32,
                         n_rot=128)
        n_ff = 11008
    if args.layers:
        import dataclasses
        hp = dataclasses.replace(hp, n_layer=args.layers)
    n_ctx = 512
    print("devices:", jax.devices(), file=sys.stderr)
    params = _build_model(hp, n_ff=n_ff)
    jax.block_until_ready(params)

    cfg = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot)

    def decode_step(params, tok, n_past, kv):
        logits, kv, _ = forward(params, tok, n_past, kv, cfg)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, kv

    copts = dict(kv.split("=", 1) for kv in args.copt)
    if copts:
        print("compiler options:", copts, file=sys.stderr)
    step = jax.jit(decode_step, donate_argnums=(3,),
                   compiler_options=copts or None)
    kv = init_kv_cache(hp, args.batch, n_ctx, dtype=jnp.bfloat16)
    tok = jnp.zeros((args.batch, 1), jnp.int32)

    if args.hlo:
        txt = step.lower(params, tok, jnp.int32(0), kv).compile().as_text()
        Path(args.hlo).write_text(txt)
        print(f"wrote compiled HLO ({len(txt)} bytes) to {args.hlo}",
              file=sys.stderr)

    def sync(tok):
        return int(np.asarray(tok)[0, 0])

    n_past = 0
    tok, kv = step(params, tok, jnp.int32(n_past), kv)
    sync(tok)
    n_past += 1
    for _ in range(3):
        tok, kv = step(params, tok, jnp.int32(n_past), kv)
        n_past += 1
    sync(tok)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            tok, kv = step(params, tok, jnp.int32(n_past), kv)
            n_past += 1
        sync(tok)

    # parse the trace: find the .trace.json.gz
    paths = glob.glob(args.out + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", args.out, file=sys.stderr)
        return 1
    path = max(paths, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device-side complete events: pid/tid mapping varies; use 'dur' events
    # whose process name contains TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    print("processes:", proc_names, file=sys.stderr)

    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)  # microseconds
        # group: strip digits/dots to cluster op instances
        key = name.split(".")[0].rstrip("0123456789_")
        agg[key] += dur
        cnt[key] += 1
        total += dur
    print(f"\ntotal device time: {total / 1e3:.2f} ms over {args.steps} steps "
          f"({total / 1e3 / args.steps:.2f} ms/step)")
    for k, v in agg.most_common(40):
        print(f"  {v / args.steps:10.1f} us/step  x{cnt[k] // args.steps:<5d} {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
