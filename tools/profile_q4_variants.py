#!/usr/bin/env python
"""Compare q4 kernel variants by DEVICE-side op durations from a profiler
trace (wall-clock microbenchmarks on the tunnel vary 2-5x run-to-run; the
trace's per-op durations are measured by the device and are stable).

Usage: python tools/profile_q4_variants.py [K] [N] [M] [variants...]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp

from fastllama_tpu.kernels.q4_matmul import q4_matmul_pallas
from _trace_util import load_device_op_breakdown

REPS = 32


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    variants = sys.argv[4:] or ["v1", "v3"]
    print(f"backend={jax.default_backend()} K={k} N={n} M={m}")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    qs = jnp.asarray(rng.integers(0, 255, (k // 2, n), dtype=np.uint8))
    scales = jnp.asarray(
        (rng.standard_normal((k // 32, n)) * 0.1).astype(np.float32))
    byt = k // 2 * n + k // 32 * n * 4

    from bench_q4_floor import _run

    from fastllama_tpu.kernels.q4_matmul import (
        q4_matmul_prefill_pallas, q4_matmul_prefill_int8)
    sc_bf16 = scales.astype(jnp.bfloat16)

    for v in variants:
        @jax.jit
        def chain(x, _v=v):
            for _ in range(REPS):
                if _v in ("floor", "nosc"):
                    y = _run(x, qs, scales, _v)
                elif _v == "pf":
                    y = q4_matmul_prefill_pallas(x, qs, scales)
                elif _v == "pfi8":
                    y = q4_matmul_prefill_int8(x, qs, scales)
                elif _v == "pfi8s":
                    y = q4_matmul_prefill_int8(x, qs, scales,
                                               variant="split")
                elif _v == "xla":
                    from fastllama_tpu.quant.tensor import QuantMatmulWeight
                    from fastllama_tpu.kernels.q4_matmul import q4_matmul_xla
                    y = q4_matmul_xla(x, QuantMatmulWeight(qs, scales))
                elif _v.endswith("h"):               # bf16-stored scales
                    y = q4_matmul_pallas(x, qs, sc_bf16, variant=_v[:-1])
                else:
                    y = q4_matmul_pallas(x, qs, scales, variant=_v)
                x = (x + y[:, :1]).astype(x.dtype)   # serialize, defeat CSE
            return x

        chain(x0).block_until_ready()                # compile outside trace
        out = f"/tmp/q4var_{v}"
        with jax.profiler.trace(out):
            r = chain(x0)
            _ = float(np.asarray(r)[0, 0])
        total, agg, cnt = load_device_op_breakdown(out)
        # the pallas op name differs per entry point; take the dominant
        # fusion containing "pallas"/"q4" in this trace
        keys = [kk for kk in agg if "q4" in kk or "pallas" in kk.lower()]
        key = max(keys, key=lambda kk: agg[kk]) if keys else None
        kern_us = (agg[key] / max(cnt.get(key, REPS), 1)) if key else 0.0
        n_calls = cnt.get(key, 0)
        if not kern_us:
            top = sorted(agg.items(), key=lambda kv: -kv[1])[:3]
            print(f"{v:4s}: no q4/pallas op found; top ops: {top}")
            continue
        print(f"{v:4s}: {kern_us:8.1f} us/call (x{n_calls})  "
              f"{byt / (kern_us * 1e-6) / 1e9:7.1f} GB/s  "
              f"(ideal@819: {byt / 819e9 * 1e6:.1f} us)")


if __name__ == "__main__":
    main()
