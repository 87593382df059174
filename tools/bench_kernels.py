"""Microbenchmark for the q4 dequant-matmul kernel variants on real TPU.

Tunnel reality (see CLAUDE.md): every blocking jit invocation pays ~25 ms
dispatch+readback latency and single-shot timings vary widely, so this tool
(a) chains `layers` full decode-layer matmul sequences (wqkv->wo->w13->w2,
all data-dependent) inside ONE jit, (b) times chains of R and 3R layers and
uses the slope dt=(t3-t1)/2R, (c) takes best-of-3 per chain.

Usage:  python tools/bench_kernels.py [--variants v0,v1,v2] [--layers 32]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fastllama_tpu.kernels.q4_matmul import q4_matmul_pallas

D = 4096
SHAPES = {                       # 7B decode matmuls
    "wqkv": (D, 12288),
    "wo": (D, D),
    "w13": (D, 22016),
    "w2": (11264, D),            # 11008 padded to 256-multiple
}
LAYER_BYTES = sum(k // 2 * n + k // 32 * n * 4 for k, n in SHAPES.values())


def make_weight(key, k, n):
    kq, ks = jax.random.split(key)
    qs = jax.random.randint(kq, (k // 2, n), 0, 256, dtype=jnp.int32
                            ).astype(jnp.uint8)
    sc = jax.random.uniform(ks, (k // 32, n), jnp.float32, 1e-3, 2e-2)
    return qs, sc


def check_err(kern, name, k, n, qs, sc):
    m = 8
    x0 = jax.random.normal(jax.random.PRNGKey(7), (m, k), jnp.float32)
    y = kern(x0, qs, sc)
    lo = (qs.astype(jnp.int32) & 0xF).astype(jnp.float32)
    hi = (qs.astype(jnp.int32) >> 4).astype(jnp.float32)
    scr = jnp.repeat(sc, 16, axis=0)
    xl = x0.reshape(m, k // 32, 32)[:, :, :16].reshape(m, k // 2)
    xh = x0.reshape(m, k // 32, 32)[:, :, 16:].reshape(m, k // 2)
    ref = (xl.astype(jnp.bfloat16).astype(jnp.float32) @ ((lo - 8) * scr) +
           xh.astype(jnp.bfloat16).astype(jnp.float32) @ ((hi - 8) * scr))
    return float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))


def bench_variant(variant, m, layers):
    weights = {nm: make_weight(jax.random.PRNGKey(i), k, n)
               for i, (nm, (k, n)) in enumerate(SHAPES.items())}
    x0 = jax.random.normal(jax.random.PRNGKey(99), (m, D), jnp.float32)
    kern = functools.partial(q4_matmul_pallas, variant=variant)

    for nm, (k, n) in SHAPES.items():
        err = check_err(kern, nm, k, n, *weights[nm])
        print(f"  {variant} {nm:5s} relerr={err:.2e}", flush=True)

    def layer(x):
        y = kern(x, *weights["wqkv"])                 # [m, 12288]
        a = y[:, :D] * 1e-3
        y = kern(a, *weights["wo"])                   # [m, 4096]
        y = kern(y * 1e-3, *weights["w13"])           # [m, 22016]
        c = y[:, :11264] * 1e-3
        y = kern(c, *weights["w2"])                   # [m, 4096]
        return x0 + y * 1e-6

    def make_chain(reps):
        @jax.jit
        def chain(x):
            for _ in range(reps):
                x = layer(x)
            return x
        return chain

    def timed(fn):
        r = fn(x0)
        _ = float(np.asarray(r)[0, 0])          # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(x0)
            _ = float(np.asarray(r)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_chain(layers))
    t3 = timed(make_chain(3 * layers))
    dt = max(t3 - t1, 1e-9) / (2 * layers)
    gbps = LAYER_BYTES / dt / 1e9
    return dt * 1e6, gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="v0,v1,v2")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    print(f"per-layer weight bytes: {LAYER_BYTES / 1e6:.1f} MB", flush=True)
    for variant in args.variants.split(","):
        us, gbps = bench_variant(variant, args.m, args.layers)
        print(f"{variant}: {us:8.1f} us/layer  {gbps:6.1f} GB/s effective",
              flush=True)


if __name__ == "__main__":
    main()
