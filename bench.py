#!/usr/bin/env python
"""Benchmark harness: LLaMA-7B q4_0 greedy decode on one TPU chip.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_per_chip_7b_q4_0", "value": N,
   "unit": "tokens/s", "vs_baseline": R}

Matches BASELINE.json config #1 (LLaMA-7B q4_0, single prompt, greedy,
n_ctx=512). Weights are synthetic (generated on-device — identical compute/
memory traffic to real weights; decode speed is weight-content-independent).

vs_baseline compares against the reference fastLLaMa's measured CPU decode
rate if `baseline_ref.json` exists (written by tools/bench_reference.py after
building /root/reference on this machine), else a documented 10 tokens/s
estimate for consumer-CPU 7B q4_0 decode.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastllama_tpu.config import HyperParams
    from fastllama_tpu.models.llama import ForwardConfig, forward
    from __graft_entry__ import _build_model

    dims = "13b" if "--dims=13b" in sys.argv[1:] else "7b"
    if dims == "13b":
        hp = HyperParams(n_vocab=32000, n_embd=5120, n_head=40, n_layer=40,
                         n_rot=128)
        n_ff = 13824
    else:
        hp = HyperParams(n_vocab=32000, n_embd=4096, n_head=32, n_layer=32,
                         n_rot=128)
        n_ff = 11008
    n_ctx = 512
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    params = _build_model(hp, n_ff=n_ff)
    jax.block_until_ready(params)
    log(f"built {dims} q4_0 weights on device in {time.time() - t0:.1f}s")

    cfg = ForwardConfig(n_head=hp.n_head, n_rot=hp.n_rot)

    def decode_step(params, tok, n_past, kv):
        logits, kv, _ = forward(params, tok, n_past, kv, cfg)
        # greedy next token on device — no host roundtrip in the loop; the
        # position counter also advances ON DEVICE (a fresh jnp.int32(host
        # int) per step costs an H2D transfer over the tunnel, measured
        # ~0.5 ms/step of dispatch overhead)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, n_past + 1, kv

    from fastllama_tpu.utils.xla_opts import decode_compiler_options
    step = jax.jit(decode_step, donate_argnums=(3,),
                   compiler_options=decode_compiler_options())

    from fastllama_tpu.models.llama import init_kv_cache
    kv = init_kv_cache(hp, 1, n_ctx, dtype=jnp.bfloat16)
    tok = jnp.zeros((1, 1), jnp.int32)

    # NOTE: on the tunneled platform block_until_ready is unreliable; a host
    # readback of the data-dependent token is the only true sync. The tunnel
    # adds a fixed readback latency, measured separately and subtracted.
    def sync(tok):
        return int(np.asarray(tok)[0, 0])

    t0 = time.time()
    n_past = jnp.int32(0)
    tok, n_past, kv = step(params, tok, n_past, kv)
    sync(tok)
    log(f"decode step compiled in {time.time() - t0:.1f}s")

    # warmup
    for _ in range(5):
        tok, n_past, kv = step(params, tok, n_past, kv)
    sync(tok)

    # measure the tunnel readback floor on an already-materialized token
    floors = []
    for _ in range(5):
        t0 = time.time()
        sync(tok)
        floors.append(time.time() - t0)
    floor = float(np.median(floors))
    log(f"tunnel readback floor: {floor * 1e3:.1f} ms")

    iters = 64
    t0 = time.time()
    for _ in range(iters):
        tok, n_past, kv = step(params, tok, n_past, kv)
    sync(tok)
    t1 = time.time() - t0
    # second leg at 3x iters: the slope removes per-run fixed overhead
    # (final readback + dispatch ramp), approximating the device step rate
    # so tunnel weather can't mask kernel regressions (VERDICT r2 weak #7)
    t0 = time.time()
    for _ in range(3 * iters):
        tok, n_past, kv = step(params, tok, n_past, kv)
    sync(tok)
    t3 = time.time() - t0
    dt = t1 - floor
    tps = iters / dt
    dev_ms = (t3 - t1) / (2 * iters) * 1e3
    dev_tps = 1e3 / dev_ms
    log(f"{iters} decode steps in {dt:.3f}s (floor-corrected) -> "
        f"{tps:.1f} tokens/s ({dt / iters * 1e3:.2f} ms/token); "
        f"slope rate {dev_tps:.1f} tok/s ({dev_ms:.2f} ms/step)")

    # -- TTFT: 512-token prefill + first decode step (wall, best-of-N) ------
    # BASELINE.json's metric names p50 TTFT explicitly; capture it in the
    # same run (round-3 verdict #5). The DEFAULT prefill path is the
    # activation-quantized int8 kernel (quality measured inside the q4_0
    # gate's own margin, round 5 — tests/test_perplexity_gate.py; the
    # reference runs its q8_0 analog unconditionally), so the headline
    # TTFT is the default path and the bit-faithful bf16 path is the
    # second field.
    import dataclasses
    # pin the path explicitly: the headline/ttft_ms_p50_int8 fields must
    # stay truthful even if FASTLLAMA_PREFILL_INT8=0 is exported
    pre_cfg = dataclasses.replace(cfg, flash_prefill=True, prefill_int8=True)

    def prefill_step(params, tokens, kv):
        logits, kv, _ = forward(params, tokens, jnp.int32(0), kv, pre_cfg)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, kv

    prefill = jax.jit(prefill_step, donate_argnums=(2,))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, hp.n_vocab, (1, 512)), jnp.int32)
    kv2 = init_kv_cache(hp, 1, n_ctx, dtype=jnp.bfloat16)
    t0 = time.time()
    first, kv2 = prefill(params, tokens, kv2)
    sync(first)
    log(f"prefill compiled+run in {time.time() - t0:.1f}s")
    ttfts = []
    for _ in range(5):
        kv2 = init_kv_cache(hp, 1, n_ctx, dtype=jnp.bfloat16)
        jax.block_until_ready(kv2)
        t0 = time.time()
        first, kv2 = prefill(params, tokens, kv2)
        tok2, _, kv2 = step(params, first, jnp.int32(512), kv2)
        sync(tok2)
        ttfts.append((time.time() - t0 - floor) * 1e3)
    ttft_p50 = float(np.median(ttfts))
    log(f"TTFT(512, default=int8) trials: {[f'{t:.1f}' for t in ttfts]} ms "
        f"-> p50 {ttft_p50:.1f} ms")

    # -- TTFT on the pinned bit-faithful bf16 dequant path ------------------
    bf_cfg = dataclasses.replace(pre_cfg, prefill_int8=False)

    def prefill_bf(params, tokens, kv):
        logits, kv, _ = forward(params, tokens, jnp.int32(0), kv, bf_cfg)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
        return nxt, kv

    prefillb = jax.jit(prefill_bf, donate_argnums=(2,))
    kv2 = init_kv_cache(hp, 1, n_ctx, dtype=jnp.bfloat16)
    t0 = time.time()
    first, kv2 = prefillb(params, tokens, kv2)
    sync(first)
    log(f"bf16 prefill compiled+run in {time.time() - t0:.1f}s")
    ttftsb = []
    for _ in range(5):
        kv2 = init_kv_cache(hp, 1, n_ctx, dtype=jnp.bfloat16)
        jax.block_until_ready(kv2)
        t0 = time.time()
        first, kv2 = prefillb(params, tokens, kv2)
        tok2, _, kv2 = step(params, first, jnp.int32(512), kv2)
        sync(tok2)
        ttftsb.append((time.time() - t0 - floor) * 1e3)
    ttftb_p50 = float(np.median(ttftsb))
    log(f"TTFT(512, bf16) trials: {[f'{t:.1f}' for t in ttftsb]} ms -> p50 "
        f"{ttftb_p50:.1f} ms")

    baseline = 10.0
    baseline_src = "estimate"
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_ref.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        # per-dims baseline when present ("tokens_per_sec_13b"); the 7B
        # reference number must not masquerade as a 13B speedup ratio
        key = f"tokens_per_sec_{dims}"
        if key in ref:
            baseline = float(ref[key])
        elif dims == "7b":
            baseline = float(ref["tokens_per_sec"])
        else:
            baseline = None
        baseline_src = ref.get("source", "measured")
    log(f"baseline: {baseline} tokens/s ({baseline_src})")

    out = {
        "metric": f"decode_tokens_per_sec_per_chip_{dims}_q4_0",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "steady_state_tokens_per_sec": round(dev_tps, 2),
        "ttft_ms_p50": round(ttft_p50, 1),      # default path (int8 prefill)
        "ttft_ms_p50_int8": round(ttft_p50, 1),  # continuity with r4 field
        "ttft_ms_p50_bf16": round(ttftb_p50, 1),
    }
    if baseline is not None:
        out["vs_baseline"] = round(tps / baseline, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
