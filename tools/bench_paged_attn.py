"""Microbenchmark: paged attention vs the slab fused decode attention on
real TPU, slope-timed (see bench_kernels.py for the method — the tunnel's
~25 ms dispatch latency makes single-shot timing useless).

Usage: python tools/bench_paged_attn.py [--batch 8]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

H, D, PS = 32, 128, 64       # 7B heads, head_dim; page size


def timed(fn, x):
    r = fn(x)
    _ = float(np.asarray(r).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(x)
        _ = float(np.asarray(r).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_chain, reps, x):
    t1 = timed(make_chain(reps), x)
    t3 = timed(make_chain(3 * reps), x)
    return max(t3 - t1, 1e-9) / (2 * reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()
    b, s = args.batch, args.n_ctx
    pps = s // PS
    total_pages = b * pps + 1

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (H, total_pages, PS, D), jnp.bfloat16)
    vp = jax.random.normal(key, (H, total_pages, PS, D), jnp.bfloat16)
    tables = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    q0 = jax.random.normal(key, (b, H, D), jnp.float32)
    kv_bytes = 2 * b * s * H * D * 2            # full-length K+V read

    from fastllama_tpu.engine.paged_kv import paged_attention_tpu
    from fastllama_tpu.kernels.decode_attention import decode_attention
    from fastllama_tpu.kernels.paged_attention import (
        paged_attn_supported, paged_decode_attention,
    )

    assert paged_attn_supported(H, pps, PS, D)
    for length in (s - PS, 64):
        lengths = jnp.full((b,), length, jnp.int32)
        frac = length / s

        def make_chain(reps):
            @jax.jit
            def chain(q):
                for _ in range(reps):
                    o = paged_decode_attention(q.astype(jnp.bfloat16), kp, vp,
                                               lengths, tables)
                    q = q * 0.5 + o.astype(jnp.float32) * 1e-3
                return q
            return chain
        dt = slope(make_chain, args.reps, q0)
        print(f"own    len={length:4d}: {dt * 1e6:7.1f} us "
              f"({kv_bytes * frac / dt / 1e9:6.1f} GB/s of live KV)",
              flush=True)

    for length in (s - PS, 64):
        lengths = jnp.full((b,), length, jnp.int32)
        frac = length / s
        for ppcb in (1, 2, 4, pps):
            def make_chain(reps, ppcb=ppcb):
                @jax.jit
                def chain(q):
                    for _ in range(reps):
                        o = paged_attention_tpu(q.astype(jnp.bfloat16), kp, vp,
                                                lengths, tables,
                                                pages_per_compute_block=ppcb)
                        q = q * 0.5 + o.astype(jnp.float32) * 1e-3
                    return q
                return chain
            dt = slope(make_chain, args.reps, q0)
            print(f"paged  len={length:4d} ppcb={ppcb}: {dt * 1e6:7.1f} us "
                  f"({kv_bytes * frac / dt / 1e9:6.1f} GB/s of live KV)",
                  flush=True)

    # slab fused decode attention over [B, S, H*D], cache depth = length
    kc = jax.random.normal(key, (b, s, H * D), jnp.bfloat16)
    vc = jax.random.normal(key, (b, s, H * D), jnp.bfloat16)
    for length in (s - PS, 64):
        npast = jnp.full((b,), length, jnp.int32)

        def make_chain(reps):
            @jax.jit
            def chain(q):
                for _ in range(reps):
                    o = decode_attention(q.reshape(b, 1, H * D), kc, vc,
                                         npast, head_dim=D,
                                         scale=1.0 / np.sqrt(D))
                    q = q * 0.5 + o.reshape(b, H, D) * 1e-3
                return q
            return chain
        dt = slope(make_chain, args.reps, q0)
        print(f"slab   len={length:4d} (reads full S): {dt * 1e6:7.1f} us "
              f"({kv_bytes / dt / 1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
