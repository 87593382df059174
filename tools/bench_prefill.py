"""Prefill benchmark + flash-attention parity check on real TPU.

Compares the flash-prefill forward (ForwardConfig.flash_prefill=True) with
the masked-einsum path on identical weights: last-token logits must agree
to bf16-accumulation tolerance, and the flash path should cut the 512-token
prefill wall time substantially (round-1: 142 ms, ~25% MXU).

Usage: python tools/bench_prefill.py [--layers 32] [--seq 512]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--n-ctx", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fastllama_tpu.config import HyperParams
    from fastllama_tpu.models.llama import (
        ForwardConfig, forward, init_kv_cache,
    )
    from __graft_entry__ import _build_model

    print("devices:", jax.devices(), flush=True)
    hp = HyperParams(n_vocab=32000, n_embd=4096, n_head=32,
                     n_layer=args.layers, n_rot=128)
    t0 = time.time()
    params = _build_model(hp, n_ff=11008)
    print(f"weights on device in {time.time() - t0:.1f}s", flush=True)

    base = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 32000, (1, args.seq)),
        jnp.int32)

    results = {}
    for name, cfg in [("einsum", base),
                      ("flash", dataclasses.replace(base,
                                                    flash_prefill=True))]:
        fwd = jax.jit(lambda p, t, kv, cfg=cfg: forward(
            p, t, jnp.int32(0), kv, cfg, jnp.int32(args.seq - 1)))

        def run():
            kv = init_kv_cache(hp, 1, args.n_ctx, dtype=jnp.bfloat16)
            lg, kv2, _ = fwd(params, tokens, kv)
            return lg

        t0 = time.time()
        lg = run()
        first = float(np.asarray(lg)[0, -1, 0])
        print(f"{name}: compiled+first in {time.time() - t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lg = run()
            _ = float(np.asarray(lg)[0, -1, 0])
            best = min(best, time.perf_counter() - t0)
        results[name] = (best, np.asarray(lg)[0, -1])
        print(f"{name}: prefill {args.seq} wall {best * 1e3:.1f} ms "
              f"(incl. ~27ms tunnel readback)", flush=True)

    a, b = results["einsum"][1], results["flash"][1]
    denom = max(1e-6, float(np.max(np.abs(a))))
    rel = float(np.max(np.abs(a - b))) / denom
    print(f"flash-vs-einsum last-token logits: max rel diff {rel:.3e}")
    speedup = results["einsum"][0] / results["flash"][0]
    print(f"speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
