"""Profile the full-model 512-token prefill and print the device-side op
breakdown (find where the prefill wall time goes; verify which q4 kernel
the dispatch engaged — XLA dequant path, resident-x bf16, or int8).

Usage: python tools/profile_prefill.py [--seq 512] [--reps 4]
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
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--out", default="/tmp/prof_prefill")
    ap.add_argument("--mode", default="auto",
                    choices=("auto", "int8", "bf16", "xla"),
                    help="prefill path: int8 kernel / bf16 kernel / XLA "
                         "dequant (auto = env defaults)")
    ap.add_argument("--msa-off", action="store_true",
                    help="apply the decode MSA-suppression compiler options "
                         "to the prefill jit (experiment)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fastllama_tpu.config import HyperParams
    from fastllama_tpu.models.llama import (
        ForwardConfig, forward, init_kv_cache,
    )
    from __graft_entry__ import _build_model
    from _trace_util import load_device_op_breakdown, print_breakdown

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    hp = HyperParams(n_vocab=32000, n_embd=4096, n_head=32,
                     n_layer=args.layers, n_rot=128)
    params = _build_model(hp, n_ff=11008)
    jax.block_until_ready(params)

    import os
    pin = {"auto": None, "int8": True, "bf16": False, "xla": False}[args.mode]
    if args.mode == "xla":
        os.environ["FASTLLAMA_PREFILL_KERNEL"] = "0"
    cfg = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot, flash_prefill=True,
                        prefill_int8=pin)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 32000, (1, args.seq)), jnp.int32)

    copts = None
    if args.msa_off:
        from fastllama_tpu.utils.xla_opts import DECODE_VMEM_OPTS
        copts = dict(DECODE_VMEM_OPTS)
    fwd = jax.jit(lambda p, t, kv: forward(
        p, t, jnp.int32(0), kv, cfg, jnp.int32(args.seq - 1)),
        compiler_options=copts)

    def run():
        kv = init_kv_cache(hp, 1, args.n_ctx, dtype=jnp.bfloat16)
        lg, _, _ = fwd(params, tokens, kv)
        return lg

    t0 = time.time()
    _ = float(np.asarray(run())[0, -1, 0])
    print(f"compiled+first in {time.time() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run())[0, -1, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"wall: {best * 1e3:.1f} ms (incl. tunnel readback)",
          file=sys.stderr)

    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            lg = run()
        _ = float(np.asarray(lg)[0, -1, 0])

    total, agg, cnt = load_device_op_breakdown(args.out)
    print_breakdown(total, agg, cnt, args.reps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
