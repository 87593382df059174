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


# ---------------------------------------------------------------------------
# Fully-fused decode step attention: RoPE(q,k) + cache write + attention.
#
# The unfused decode path spends ~250 us/step (7B, B=1) on XLA glue around
# this kernel: the interleaved-RoPE de-interleave reshapes put a size-2 axis
# in the lane dimension (f32[.,.,H,64,2] relayouts), split_qkv slices three
# views out of the fused projection, and the cache write is a separate
# dynamic_update_slice per layer. Here the kernel consumes the RAW fused
# qkv output [B, 1, 3F] via three BlockSpec windows (no split in XLA), ropes
# q/k on the fly, blends the new K/V row into its 8-row cache group IN PLACE
# (input_output_aliases, like kernels/kv_write.py), and attends.
#
# RoPE-as-matmul: the adjacent-pair rotation is
#     rot(x)[l] = x[l]*cos[l] + x[l^1]*sin_signed[l]
# where sin_signed folds the -sin of the even lane. The lane-partner gather
# x[l^1] is one [d, d] MXU pass against a 0/1 swap matrix built from iotas —
# no lane shuffles on the VPU. cos/sin_signed come in precomputed per
# position ([B, d], rope_lane_tables below — one tiny XLA op per step,
# replacing 2 rope chains per layer).
#
# The new token's score/value never need the written row: attention reads
# rows < n_past from the old cache and folds the new (roped) K/V in
# analytically, so there is no read-after-write hazard on the aliased pools.
# ---------------------------------------------------------------------------


def rope_lane_tables(positions: jax.Array, head_dim: int, n_rot: int):
    """Per-lane RoPE tables for the fused decode kernel.

    Returns (cos [B, d], sin_signed [B, d]) f32 with the ggml interleaved
    convention (kernels/rope.py): lane l < n_rot uses pair angle
    p * 10000^(-2*(l//2)/n_rot); lanes >= n_rot pass through (cos=1, sin=0).
    sin_signed carries the even-lane minus sign."""
    d = head_dim
    l = jnp.arange(d, dtype=jnp.int32)
    pair = (l // 2).astype(jnp.float32)
    freq = jnp.float32(10000.0) ** (-2.0 * pair / n_rot)
    theta = positions.astype(jnp.float32)[:, None] * freq[None, :]
    active = (l < n_rot)[None, :]
    cos = jnp.where(active, jnp.cos(theta), 1.0)
    sign = jnp.where(l % 2 == 0, -1.0, 1.0)[None, :]
    sin = jnp.where(active, jnp.sin(theta) * sign, 0.0)
    return cos, sin


def _swap_matrix(d: int, n_rot: int, dtype):
    """[d, d] P with (x @ P)[l] = x[l^1] for l < n_rot, x[l] otherwise."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    swapped = (rows == (cols ^ 1)).astype(dtype)   # select over i1 values is
    ident = (rows == cols).astype(dtype)           # unsupported in Mosaic
    return jnp.where(cols < n_rot, swapped, ident)


def _fused_kernel_grouped(npast_ref, cos_ref, sin_ref, q_ref, k_ref, v_ref,
                          kc_ref, vc_ref, o_ref, kout_ref, vout_ref, *,
                          scale, n_rot, g):
    """Head-grouped cell: grid (B, H//g); each cell ropes/writes/attends g
    heads (static unrolled loop) over its [S, g*d] cache window. g trades
    per-cell pipeline overhead (small g -> many cells; B=8 g=1 measured
    5.35 ms/layer-set vs a 2.6 ms DMA floor) against VMEM (the window is
    double-buffered across cells; g=h at B=1 is a single cell and may fill
    VMEM entirely)."""
    b = pl.program_id(0)
    gi = pl.program_id(1)
    s = kc_ref.shape[1]
    fb = kc_ref.shape[2]                     # g * d
    d = fb // g
    grp = kout_ref.shape[1]
    np_b = npast_ref[b]
    np_w = jnp.clip(np_b, 0, s - 1)

    cos = cos_ref[0, gi][None, :]            # [1, g*d] (dynamic sublane pick)
    sin = sin_ref[0, gi][None, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, fb), 1)
    even = lane % 2 == 0

    def rope(x):                             # [1, g*d]; pairs never cross heads
        partner = jnp.where(even, pltpu.roll(x, fb - 1, 1),
                            pltpu.roll(x, 1, 1))
        return x * cos + partner * sin

    q = rope(q_ref[0].astype(jnp.float32))   # [1, g*d]
    k_new = rope(k_ref[0].astype(jnp.float32))
    v_new = v_ref[0].astype(jnp.float32)

    r = np_w % grp
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, grp, 1), 1) == r
    g0 = (np_w // grp) * grp
    k_grp = kc_ref[0, pl.ds(g0, grp), :]
    v_grp = vc_ref[0, pl.ds(g0, grp), :]
    kout_ref[:] = jnp.where(sel, k_new[:, None, :].astype(kout_ref.dtype),
                            k_grp[None])
    vout_ref[:] = jnp.where(sel, v_new[:, None, :].astype(vout_ref.dtype),
                            v_grp[None])

    # The cache stays in ITS dtype for the dots (MXU takes bf16 natively
    # with f32 accumulation — casting the whole [S, g*d] K and V to f32 on
    # the VPU is wasted work); q/p are cast down to match instead.
    kd = kc_ref.dtype
    q_mx = q.astype(kd)
    for hi in range(g):
        c = slice(hi * d, (hi + 1) * d)
        q_h = q[:, c]
        kn_h = k_new[:, c]
        vn_h = v_new[:, c]
        k = kc_ref[0, :, c]                            # [S, d], cache dtype
        scores = jax.lax.dot_general(
            q_mx[:, c], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mask = pos < np_b
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        s_new = jnp.sum(q_h * kn_h, axis=-1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_new)
        p = jnp.where(mask, jnp.exp(scores - m), 0.0)
        e_new = jnp.exp(s_new - m)
        l = jnp.sum(p, axis=-1, keepdims=True) + e_new
        v = vc_ref[0, :, c]
        ctx = jax.lax.dot_general(
            p.astype(kd), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, c] = (ctx + e_new * vn_h) / l


def _pick_heads_per_cell(b: int, h: int, s: int, d: int, itemsize: int) -> int:
    """Largest g (divisor of h) whose double-buffered [S, g*d] K+V windows
    fit the 16 MB scoped-VMEM budget; a single cell (b==1, g==h) skips the
    double buffering and may use more — but only up to ~9 MB: at 13B
    (10.5 MB single-cell windows) splitting to two cells measured 654 vs
    860 us/step (pipelining beats the one giant DMA), while 7B (8.4 MB)
    is fastest whole."""
    per_head = 2 * s * d * itemsize          # K + V window bytes per head
    if b == 1 and per_head * h <= 9 << 20:
        return h
    g = h
    while g > 1 and per_head * g * 2 > 12 << 20:
        g = max(dv for dv in range(1, g) if h % dv == 0)
    return g


@functools.partial(jax.jit, static_argnames=("head_dim", "n_rot", "scale",
                                              "interpret", "wide"))
def decode_attention_fused(qkv: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, n_past: jax.Array,
                           cos: jax.Array, sin: jax.Array, *,
                           head_dim: int, n_rot: int, scale: float,
                           interpret: bool = False, wide: bool = True):
    # wide=True (default): auto-pick heads per grid cell for VMEM
    # (_pick_heads_per_cell). wide=False: force one head per cell.
    """One decode step's attention, fused: rope + cache write + attend.

    Args:
      qkv: [B, 1, 3F] raw fused projection output ([Q | K | V] blocks,
        models/fuse.py), pre-RoPE.
      k_cache/v_cache: [B, S, F] (donated; updated in place via aliasing).
      n_past: [B] int32 per-sequence depth; the new token lands at row
        n_past[b] and attends rows < n_past[b] plus itself.
      cos/sin: [B, head_dim] rope_lane_tables(positions).
    Returns (ctx [B, 1, F] f32, k_cache, v_cache).
    """
    b, s, f = k_cache.shape
    d = head_dim
    h = f // d
    n_past = jnp.asarray(n_past, jnp.int32).reshape(b)
    grp = 8

    out_shape = [jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
                 jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                 jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)]

    g = _pick_heads_per_cell(b, h, s, d, jnp.dtype(k_cache.dtype).itemsize)
    if not wide:
        g = 1
    ng = h // g
    fb = g * d

    # rope tables tiled across the cell's heads, grouped 3-D so the kernel
    # can pick its group row (a (1, fb) block on a multi-row array is an
    # illegal sublane-1 tile in Mosaic; the middle dim rides along whole).
    cos3 = jnp.tile(cos, (1, h)).reshape(b, ng, fb)
    sin3 = jnp.tile(sin, (1, h)).reshape(b, ng, fb)

    def row_group(bi, gi, np_ref):
        return (bi, jnp.clip(np_ref[bi], 0, s - 1) // grp, gi)

    table_spec = pl.BlockSpec((1, ng, fb), lambda bi, gi, n: (bi, 0, 0))
    q_spec = pl.BlockSpec((1, 1, fb), lambda bi, gi, n: (bi, 0, gi))
    k_spec = pl.BlockSpec((1, 1, fb), lambda bi, gi, n: (bi, 0, gi + ng))
    v_spec = pl.BlockSpec((1, 1, fb), lambda bi, gi, n: (bi, 0, gi + 2 * ng))
    cache_spec = pl.BlockSpec((1, s, fb), lambda bi, gi, n: (bi, 0, gi))
    out_grp_spec = pl.BlockSpec((1, grp, fb), row_group)

    kernel = functools.partial(_fused_kernel_grouped, scale=scale,
                               n_rot=n_rot, g=g)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[table_spec, table_spec, q_spec, k_spec, v_spec,
                      cache_spec, cache_spec],
            out_specs=[pl.BlockSpec((1, 1, fb), lambda bi, gi, n: (bi, 0, gi)),
                       out_grp_spec, out_grp_spec],
            grid=(b, ng),
        ),
        out_shape=out_shape,
        # operands: npast(0) cos(1) sin(2) q(3) k(4) v(5) k_cache(6) v_cache(7)
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(n_past, cos3, sin3, qkv, qkv, qkv, k_cache, v_cache)
