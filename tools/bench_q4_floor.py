#!/usr/bin/env python
"""Find the q4 kernel's memory floor: how fast can THIS access pattern move
the weight bytes when the kernel body does (almost) nothing?

Three kernels over the same grid/BlockSpecs as kernels/q4_matmul.py:
  floor   — one int32 widen + one dot against x_lo (raw codes, no unpack of
            the hi nibble, no scales): the cheapest body that still touches
            every qs byte and produces an MXU-shaped output.
  nosc    — full nibble unpack + two dots, but scale plane never loaded and
            no scale multiply: isolates the cost of the scale path.
  real    — the production v1 kernel, same shapes, for comparison.

Run ON TPU (not under the CPU pin):
    python tools/bench_q4_floor.py [K] [N] [M]

Timing: in-situ style — R dependent calls chained through the activation
(y's first column added into x) inside ONE jit, single readback. Avoids both
the per-call ~25 ms dispatch and the fori_loop slowdown (CLAUDE.md).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastllama_tpu.kernels.q4_matmul import (
    QBLOCK, _pick_tile, _pick_tile_k, q4_matmul_pallas, split_activation)


def _floor_kernel(x_lo_ref, qs_ref, out_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(x_lo_ref[:].astype(jnp.bfloat16), qs,
                          preferred_element_type=jnp.float32)


def _nosc_kernel(x_lo_ref, x_hi_ref, qs_ref, out_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    lo = (qs & 0x0F).astype(jnp.bfloat16)
    hi = (qs >> 4).astype(jnp.bfloat16)
    acc = jnp.dot(x_lo_ref[:].astype(jnp.bfloat16), lo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[:].astype(jnp.bfloat16), hi,
                   preferred_element_type=jnp.float32)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("mode",))
def _run(x, qs, scales, mode):
    m, k = x.shape
    n = qs.shape[1]
    bn = _pick_tile(n)
    bk = _pick_tile_k(k)
    grid = (n // bn, k // bk)
    x_lo, x_hi = split_activation(x)
    x_spec = pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk),
                          memory_space=pltpu.VMEM)
    qs_spec = pl.BlockSpec((bk // 2, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    if mode == "floor":
        return pl.pallas_call(_floor_kernel, in_specs=[x_spec, qs_spec],
                              **common)(x_lo, qs)
    if mode == "nosc":
        return pl.pallas_call(_nosc_kernel, in_specs=[x_spec, x_spec, qs_spec],
                              **common)(x_lo, x_hi, qs)
    return q4_matmul_pallas(x, qs, scales, variant=mode)


def time_mode(mode, x, qs, scales, reps=64, trials=3):
    """SLOPE method (CLAUDE.md): wall time of one blocking chain includes a
    ~50 ms fixed dispatch+readback cost on the tunnel, so time chains of R
    and 3R inlined calls and divide the difference by 2R."""
    def make_chain(r):
        @jax.jit
        def chain(x):
            # data dependence through x so CSE can't collapse the calls
            for _ in range(r):
                y = _run(x, qs, scales, mode)
                x = (x + y[:, :1]).astype(x.dtype)
            return x
        return chain

    c1, c3 = make_chain(reps), make_chain(3 * reps)

    def wall(fn):
        fn(x).block_until_ready()     # compile
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            _ = float(np.asarray(fn(x))[0, 0])   # true sync
            best = min(best, time.perf_counter() - t0)
        return best

    return (wall(c3) - wall(c1)) / (2 * reps)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"backend={jax.default_backend()} K={k} N={n} M={m}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    qs = jnp.asarray(rng.integers(0, 255, (k // 2, n), dtype=np.uint8))
    scales = jnp.asarray(rng.standard_normal((k // QBLOCK, n)), jnp.float32)

    qs_bytes = k // 2 * n
    sc_bytes = k // QBLOCK * n * 4
    modes = sys.argv[4].split(",") if len(sys.argv) > 4 else [
        "floor", "nosc", "v1", "v3"]
    for mode in modes:
        byt = qs_bytes if mode in ("floor", "nosc") else qs_bytes + sc_bytes
        dt = time_mode(mode, x, qs, scales)
        print(f"{mode:6s}: {dt*1e6:8.1f} us  {byt/dt/1e9:7.1f} GB/s "
              f"(ideal@819: {byt/819e9*1e6:.1f} us)")


if __name__ == "__main__":
    main()
