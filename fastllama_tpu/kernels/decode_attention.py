"""Fused decode attention: one Pallas kernel per layer for the hot loop.

Replaces the decode-path attention chain in models/llama._attention (two
einsums + mask + softmax + four reshapes per layer — profiled at ~2 ms/step
of small-op glue on v5e: each tiny XLA op stalls the weight-DMA pipeline of
the surrounding quantized matmuls). The reference's analog is the per-token
attention subgraph of Model::eval (/root/reference/lib/llama.cpp:346-403:
diag_mask_inf + soft_max + V gather), which materializes full score rows;
here the scores live only in VMEM.

Design (decode: one query token per sequence):
  * The KV cache is stored FLAT, [B, S, H*Dh] (models/llama.init_kv_cache):
    head h's keys are the contiguous lane-aligned column block
    [h*Dh, (h+1)*Dh) — exactly the unit a BlockSpec can carve. (A 4-D
    [B, S, H, Dh] layout cannot be blocked per-head: a size-1 block on the
    sublane-adjacent H axis is illegal in Mosaic, and reshaping to flat at
    call time costs a full physical cache copy per layer, since TPU tiled
    layouts differ.)
  * grid (B, H): each cell attends one (sequence, head) pair. Pallas
    auto-pipelines the [S, Dh] K/V blocks HBM->VMEM with double buffering
    while neighbouring cells compute. S <= 2048 keys fit whole (512 KB in
    bf16), so no online-softmax tiling: the full masked softmax runs in
    f32 with the scores resident in VMEM.
  * The cache row already contains the current token, written by the cheap
    XLA scatter (a dataflow dependency, so no ordering race); the mask
    s <= n_past[b] (scalar-prefetched, SMEM) makes the kernel read exactly
    the prefix the einsum path reads.
  * Inactive engine slots (n_past > S) degenerate to an unmasked softmax
    over whatever is resident — finite garbage, discarded by the engine.

Numerics: scores and softmax in f32 regardless of cache dtype (matching the
f32 softmax of the einsum path); `preferred_element_type=f32` on both dots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(npast_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    b = pl.program_id(0)

    q = q_ref[0].astype(jnp.float32)                  # [1, D]
    k = k_ref[0].astype(jnp.float32)                  # [S, D]

    # scores[1, S] = q . k_s, f32 accumulation on the MXU
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = pos <= npast_ref[b]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0].astype(jnp.float32)                  # [S, D]
    ctx = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [1, D]
    o_ref[0] = ctx / l


@functools.partial(jax.jit, static_argnames=("head_dim", "scale", "interpret"))
def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     n_past: jax.Array, *, head_dim: int, scale: float,
                     interpret: bool = False) -> jax.Array:
    """ctx[B, 1, H*D] = softmax(q . K[:n_past+1] * scale) @ V[:n_past+1].

    Args:
      q: [B, 1, H*D] post-RoPE query for the current token (any float
        dtype), heads flattened like the cache.
      k_cache/v_cache: [B, S, H*D] — including the current token already
        written at position n_past[b].
      n_past: [B] int32 — per-sequence depth; key s participates iff
        s <= n_past[b].
    """
    b, s, f = k_cache.shape
    d = head_dim
    h = f // d
    n_past = jnp.asarray(n_past, jnp.int32).reshape(b)

    kernel = functools.partial(_decode_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[
                pl.BlockSpec((1, 1, d), lambda bi, hi, n: (bi, 0, hi)),
                pl.BlockSpec((1, s, d), lambda bi, hi, n: (bi, 0, hi)),
                pl.BlockSpec((1, s, d), lambda bi, hi, n: (bi, 0, hi)),
            ],
            out_specs=pl.BlockSpec((1, 1, d), lambda bi, hi, n: (bi, 0, hi)),
            grid=(b, h),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(n_past, q, k_cache, v_cache)


def decode_attn_supported(s: int, d: int) -> bool:
    """Mosaic shape gate: lane-aligned head dim, sublane-aligned seq."""
    return d % 128 == 0 and s % 8 == 0 and s >= 128
