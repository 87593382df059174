"""Fused q4_0 dequant + matmul — the framework's hot kernel.

Replaces the reference's quantized matmul (`ggml_compute_forward_mul_mat_q_f32`,
/root/reference/lib/ggml.c:7928-8170: int4×int8 SIMD dot over row-split
threads). TPU-native design instead: packed nibbles and scales are the only
weight bytes that cross HBM→VMEM; dequantization happens in VMEM on the VPU
and feeds bf16 tiles straight to the MXU with f32 accumulation.

Layout contract (see quant/tensor.py): W is [K, N] with split-K packing, so
``lo = qs & 0xF`` / ``hi = qs >> 4`` are the two K-halves of each 32-block
under a fixed reindexing of K. The activation is pre-split on the host of the
kernel into x_lo/x_hi (cheap XLA slices of [M, K]); the kernel then runs two
interleave-free MXU passes per tile:

    acc += x_lo_tile @ dequant(lo) + x_hi_tile @ dequant(hi)

Two implementations with identical semantics:
  * ``q4_matmul_xla``   — jnp dequant + dot; XLA fuses. Used for prefill
                          (compute-bound, large M) and as CPU/test fallback.
  * ``q4_matmul_pallas``— the Pallas kernel. Used for decode (bandwidth-bound).

``q4_matmul`` picks automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.tensor import QBLOCK, QuantMatmulWeight, dequant_matmul_weight

HALF = QBLOCK // 2  # 16

# Mosaic's default scoped-VMEM budget is 16 MB. Raising it via
# CompilerParams(vmem_limit_bytes=...) admits whole-K tiles (faster in
# kernel-only microbenches) but ALSO changes the compiler's operand layout
# choices: with a 100 MB limit the same kernels provoked ~1.9 us/slice
# relayout DMAs around every call (+470 us/step at 7B) even at the default
# tiling. Keep the default budget.
#
# FASTLLAMA_WHOLEK=1 re-opens the experiment: round 2 measured the relayout
# BEFORE round 3 found that the in-engine slice/copy staging around pallas
# calls is MSA's VMEM prefetch pass (suppressed for decode jits via
# utils/xla_opts.py) — whole-K single-step tiles were ~8% faster kernel-only
# ((4096, 22528): 90.8 vs 98.3 us) and may now hold in-engine.
import os as _os
_WHOLEK = _os.environ.get("FASTLLAMA_WHOLEK", "0") != "0"
# "1": whole-K decode tiles + 100 MB scoped-VMEM limit (measured: kernels
# -217 us/step but +478 us of slice staging around them — net worse).
# "2": whole-K at a MINIMAL raise (the (4096, 1024) tile set misses the
# default budget by only 988K: "Scoped allocation with size 16.96M").
# Unrecognized non-zero values (e.g. "true") map to the safe minimal tier:
# whole-K tiles under the DEFAULT budget are a known scoped-VMEM OOM.
_VMEM_LIMIT = {None: None, "1": 100 * 1024 * 1024,
               "2": 20 * 1024 * 1024}.get(
    _os.environ.get("FASTLLAMA_WHOLEK") if _WHOLEK else None,
    20 * 1024 * 1024)


def _dot_precision(w_dtype):
    """f32 weights (parity/test mode) must not be silently downcast by the
    backend's default matmul precision; bf16 runs native MXU passes."""
    return jax.lax.Precision.HIGHEST if jnp.dtype(w_dtype) == jnp.float32 else None


def _pick_tile(dim: int, cap: int = 1024, unit: int = 128) -> int:
    """Largest divisor of dim that is a multiple of `unit` and <= cap.
    Falls back to the dim itself (small matrices in tests)."""
    best = 0
    d = unit
    while d <= cap:
        if dim % d == 0:
            best = d
        d += unit
    return best or dim


def _pick_tile_k(k: int, cap: int = 2816, n: int = 0) -> int:
    """K tile: multiple of 256 (so K/2 tiles are 128-lane aligned in the
    packed plane) dividing k, as large as possible up to cap.

    K > 4096 saw no gain from bk > 2816 (11264: 49.2 us at
    2816/5632/11264 alike). The `n` arg is kept for tile policies that
    depend on output width (see NOTE below)."""
    # NOTE: whole-K single-step tiles (bk=k at k<=4096, via the VMEM-limit
    # raise) measured FASTER in kernel-only terms — (4096, 22528) 90.8 vs
    # 98.3 us, (4096, 32768) 129.6 vs 142.8 — but in-engine they lose.
    # Round-4 closure (FASTLLAMA_WHOLEK A/B): the staging is caused by the
    # vmem-limit raise itself (100 MB: kernels -217 us/step but +478 us of
    # MSA slice staging that the vf-flag suppression does NOT remove;
    # default budget: scoped-VMEM OOM by 988K; minimal 20 MB raise:
    # compiles clean, no staging, but kernels +59 us). Keep capped
    # multi-step tiling.
    return _pick_tile(k, cap=cap, unit=256)


def split_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split x [..., K] into the block-halves matching split-K packing.

    x_lo[..., 16*b + j] = x[..., 32*b + j]
    x_hi[..., 16*b + j] = x[..., 32*b + 16 + j]
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    xb = x.reshape(*lead, k // QBLOCK, QBLOCK)
    x_lo = xb[..., :HALF].reshape(*lead, k // 2)
    x_hi = xb[..., HALF:].reshape(*lead, k // 2)
    return x_lo, x_hi


def _dequant_half(qs_half: jax.Array, scale_rep: jax.Array, acc_dtype) -> jax.Array:
    """[BK/2, BN] int32 codes (0..15) + repeated scales -> bf16 weights."""
    w = (qs_half - 8).astype(jnp.float32)
    return (w * scale_rep).astype(acc_dtype)


def _repeat_scales(scales: jax.Array) -> jax.Array:
    """[BK/32, BN] -> [BK/2, BN] by 16x sublane repeat.

    broadcast_to + reshape benchmarked faster than jnp.repeat under Mosaic
    (538 vs 455 GB/s effective on a 4096x4096 q4 matmul, v5e).
    """
    nb, n = scales.shape
    return jnp.broadcast_to(scales[:, None, :], (nb, HALF, n)).reshape(nb * HALF, n)


def _q4mm_kernel(x_lo_ref, x_hi_ref, qs_ref, sc_ref, out_ref, *, w_dtype):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Mosaic has no uint8->f32 cast; widen to int32 for the bit ops instead.
    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    w_lo = _dequant_half((qs & 0x0F), sc, w_dtype)
    w_hi = _dequant_half((qs >> 4), sc, w_dtype)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc


def _corr_dot(bs_t, sc_f):
    """(-8) * bsum @ scales, contracting the block axis. bs_t is [NB, M]
    (block-major so its lane dim M can equal the full array dim — Mosaic
    rejects sub-128 lane tiles otherwise); sc_f is [NB, BN]."""
    return jax.lax.dot_general(
        bs_t, sc_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * (-8.0)


def _q4mm_kernel_v1(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref, *,
                    w_dtype):
    """Offset-folded variant: w = (q-8)*s  =>  x@w = x@(q*s) - 8*(bsum@s).

    The -8 subtraction leaves the per-element VPU chain; it reappears as one
    tiny MXU matmul against the precomputed per-block activation sums
    bs [K/32, M] (host of the kernel computes them with one XLA reduce).
    """
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)
    sc = _repeat_scales(sc_f)
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc).astype(w_dtype)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc + _corr_dot(bs_ref[:], sc_f)


def _q4mm_kernel_v7(x_lo_ref, x_hi_ref, qs_ref, sc_ref, out_ref, *, w_dtype):
    """v1 with the -8 correction's block sums computed IN-KERNEL on the MXU.

    v1 takes a precomputed bsum operand, which costs the XLA host of every
    call a reshape + reduce_sum + transpose chain (~1.5 us/call of small-op
    overhead at decode sizes, 129 calls/step). Here the block sums fall out
    of one extra tiny MXU dot against a 0/1 group matrix G[i, b] = [i//16 ==
    b]:  bsum = (x_lo + x_hi) @ G  ([M, BK/2] @ [BK/2, BK/32] -> [M, NB]),
    then corr = -8 * bsum @ scales. The group matrix is built from iotas on
    the VPU (BK/2 * NB elements, trivial next to the dequant chain)."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)
    sc = _repeat_scales(sc_f)
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc).astype(w_dtype)

    prec = _dot_precision(w_dtype)
    x_lo = x_lo_ref[:].astype(w_dtype)
    x_hi = x_hi_ref[:].astype(w_dtype)
    acc = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32,
                  precision=prec)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32,
                   precision=prec)

    bkh = x_lo.shape[1]
    nb = sc_f.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bkh, nb), 0) // HALF
    cols = jax.lax.broadcasted_iota(jnp.int32, (bkh, nb), 1)
    g = (rows == cols).astype(w_dtype)
    bs = jnp.dot((x_lo + x_hi), g, preferred_element_type=jnp.float32,
                 precision=prec)                       # [M, NB]
    corr = jax.lax.dot_general(
        bs, sc_f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * (-8.0)
    out_ref[:] += acc + corr


def _q4mm_kernel_v2(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref, *,
                    w_dtype):
    """Per-block MXU accumulation: the VPU only unpacks and converts codes
    (no per-element scale multiply, no subtract) —

        x @ W = sum_b s_b * (x_b @ q_b) - 8 * (bsum @ s)

    Per 32-block b the two split-K halves contribute two K=16 MXU passes;
    the per-block scale lands on the [M, BN] partial product (M*N/32 VPU
    multiplies instead of K*N). Cuts dequant VPU work ~2.5x vs v0 at the
    cost of 2*BK/32 small matmuls per tile — worth it exactly when the op
    is VPU-bound (decode), which the dispatcher knows.
    """
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    lo = (qs & 0x0F).astype(w_dtype)            # codes 0..15, exact in bf16
    hi = (qs >> 4).astype(w_dtype)
    sc_f = sc_ref[:].astype(jnp.float32)        # [BK/32, BN]
    x_lo = x_lo_ref[:].astype(w_dtype)
    x_hi = x_hi_ref[:].astype(w_dtype)

    prec = _dot_precision(w_dtype)
    nb = sc_f.shape[0]
    acc = _corr_dot(bs_ref[:], sc_f)
    for b in range(nb):
        r = slice(HALF * b, HALF * (b + 1))
        z = jnp.dot(x_lo[:, r], lo[r], preferred_element_type=jnp.float32,
                    precision=prec)
        z += jnp.dot(x_hi[:, r], hi[r], preferred_element_type=jnp.float32,
                     precision=prec)
        acc += z * sc_f[b][None, :]
    out_ref[:] += acc


def _q4mm_kernel_v3(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref, *,
                    w_dtype):
    """bf16-domain dequant with implicit scale broadcast.

    v1 spends ~4.5 VPU ops per weight element: widen, AND/SHIFT, i32->f32
    cast, f32 multiply against a MATERIALIZED 16x-repeated f32 scale plane,
    f32->bf16 cast. Here the codes are cast straight to bf16 (0..15 exact),
    the scales are cast once at block granularity (1/16th of the elements),
    and the multiply broadcasts s[nb, 1, bn] over the 16-row sublane groups
    of a 3D view — no repeated plane is ever written. The MXU sees the same
    bf16 tiles; only the rounding of (q * s) differs from v1 by at most one
    bf16 ulp (both paths round the product to bf16).
    """
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)        # [BK/32, BN] (corr dot)
    sc_b = sc_f.astype(w_dtype)[:, None, :]     # [BK/32, 1, BN]
    nb, _, bn = sc_b.shape
    lo = (qs & 0x0F).astype(w_dtype).reshape(nb, HALF, bn)
    hi = (qs >> 4).astype(w_dtype).reshape(nb, HALF, bn)
    w_lo = (lo * sc_b).reshape(nb * HALF, bn)
    w_hi = (hi * sc_b).reshape(nb * HALF, bn)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc + _corr_dot(bs_ref[:], sc_f)


def _q4mm_kernel_v4(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref, *,
                    w_dtype):
    """v1 minus the materialized scale repeat: the per-element chain stays
    f32 (bf16 elementwise ops upcast to f32 on the VPU — v3 measured slower
    for exactly that reason), but the scale multiply broadcasts
    s[nb, 1, bn] over a [nb, 16, bn] sublane view of the codes instead of
    writing a 16x-repeated plane first."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)        # [BK/32, BN]
    nb, bn = sc_f.shape
    sc3 = sc_f[:, None, :]
    lo = (qs & 0x0F).astype(jnp.float32).reshape(nb, HALF, bn)
    hi = (qs >> 4).astype(jnp.float32).reshape(nb, HALF, bn)
    w_lo = (lo * sc3).astype(w_dtype).reshape(nb * HALF, bn)
    w_hi = (hi * sc3).astype(w_dtype).reshape(nb * HALF, bn)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc + _corr_dot(bs_ref[:], sc_f)


def _q4mm_kernel_v5(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref, *,
                    w_dtype):
    """v1 with the 16x sublane repeat done by pltpu.repeat (the Mosaic
    hardware-repeat primitive) instead of broadcast_to+reshape — the one
    repeat lowering not yet measured (round-2 tried jnp.repeat and the
    3D-broadcast view)."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)
    nb, bn = sc_f.shape
    # tile-repeat along a singleton axis == element-wise sublane repeat
    sc = pltpu.repeat(sc_f[:, None, :], HALF, 1).reshape(nb * HALF, bn)
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc).astype(w_dtype)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc + _corr_dot(bs_ref[:], sc_f)


def _q41mm_kernel(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, mn_ref,
                  out_ref, *, w_dtype):
    """Affine (q4_1/GPTQ) variant with the same fold as _q4mm_kernel_v1:
    w = q*d + m  =>  x@w = x@(q*d) + bsum@m — the per-element +m add and
    its 16x-repeated mins plane leave the VPU chain entirely."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc).astype(w_dtype)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    mins = jax.lax.dot_general(
        bs_ref[:], mn_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out_ref[:] += acc + mins


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret", "w_dtype"))
def q41_matmul_pallas(x: jax.Array, qs: jax.Array, scales: jax.Array,
                      mins: jax.Array, *, block_n: int = 0, block_k: int = 0,
                      interpret: bool = False,
                      w_dtype=jnp.bfloat16) -> jax.Array:
    """Affine-quantized y = x @ (Q*d + m); f32 output."""
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)
    bn = block_n or _pick_tile(n, cap=_bn_cap(m))
    bk = block_k or _pick_tile_k(k, cap=_bk_cap(m), n=n)
    grid = (n // bn, k // bk)
    x_lo, x_hi = split_activation(x)
    bsum = x.astype(jnp.float32).reshape(m, k // QBLOCK, QBLOCK).sum(-1).T
    kernel = functools.partial(_q41mm_kernel, w_dtype=w_dtype)
    blk_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QBLOCK, m), lambda i, kk: (kk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            blk_spec,
            blk_spec,
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_lo, x_hi, bsum, qs, scales, mins)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret",
                                              "w_dtype", "variant"))
def q4_matmul_pallas(x: jax.Array, qs: jax.Array, scales: jax.Array,
                     *, block_n: int = 0, block_k: int = 0,
                     interpret: bool = False, w_dtype=jnp.bfloat16,
                     variant: str = "v1") -> jax.Array:
    """y[M, N] = x[M, K] @ dequant(W[K, N]); f32 output.

    Args:
      x: [M, K] activations (any float dtype; cast to w_dtype for the MXU).
      qs/scales: device layout per QuantMatmulWeight.
      variant: "v0" scale-on-weights (original), "v1" offset-folded
        (default — 763 GB/s effective vs v0's 476 on v5e, 93% of the
        819 GB/s HBM roofline), "v2" per-block MXU accumulation (loses:
        2*K/32 tiny dots per tile pay more in MXU dispatch than they save
        on the VPU — 358 GB/s measured).
    """
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)

    bn = block_n or _pick_tile(n, cap=_bn_cap(m))
    bk = block_k or _pick_tile_k(k, cap=_bk_cap(m), n=n)
    grid = (n // bn, k // bk)

    x_lo, x_hi = split_activation(x)

    x_spec = pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk),
                          memory_space=pltpu.VMEM)
    qs_spec = pl.BlockSpec((bk // 2, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=kh * n + (k // QBLOCK) * n * 4 + m * k * 2 + m * n * 4,
        transcendentals=0,
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=cost,
        interpret=interpret,
    )

    if variant in ("v0", "v7"):
        body = _q4mm_kernel if variant == "v0" else _q4mm_kernel_v7
        kernel = functools.partial(body, w_dtype=w_dtype)
        return pl.pallas_call(
            kernel, in_specs=[x_spec, x_spec, qs_spec, sc_spec], **common,
        )(x_lo, x_hi, qs, scales)

    # v1/v2 need per-block activation sums for the folded -8 offset,
    # stored block-major [K/32, M] so the VMEM tile's lane dim (M) equals
    # the full array dim (Mosaic's lane-divisibility rule)
    bsum = x.astype(jnp.float32).reshape(m, k // QBLOCK, QBLOCK).sum(-1).T
    bs_spec = pl.BlockSpec((bk // QBLOCK, m), lambda i, kk: (kk, 0),
                           memory_space=pltpu.VMEM)
    body = {"v1": _q4mm_kernel_v1, "v2": _q4mm_kernel_v2,
            "v3": _q4mm_kernel_v3, "v4": _q4mm_kernel_v4,
            "v5": _q4mm_kernel_v5}[variant]
    kernel = functools.partial(body, w_dtype=w_dtype)
    return pl.pallas_call(
        kernel, in_specs=[x_spec, x_spec, bs_spec, qs_spec, sc_spec], **common,
    )(x_lo, x_hi, bsum, qs, scales)


def _q4mm_prefill_kernel(x_lo_ref, x_hi_ref, bs_ref, qs_ref, sc_ref, out_ref,
                         *, w_dtype, bkh: int):
    """Large-M (prefill) body: x is VMEM-RESIDENT (constant index_map — the
    x_lo/x_hi blocks are the FULL [M, K/2] arrays, loaded once for the whole
    kernel) and sliced in-kernel by the k program id. Same offset-folded
    math as _q4mm_kernel_v1.

    Why a separate body (measured, round 3): at M=512 the k-blocked x specs
    re-fetch 2*[M, bk/2] bf16 tiles per grid cell (the full prefill ran
    170.8 ms vs XLA's 130), and whole-K single-step tiles crash the remote
    Mosaic compiler in full programs. Resident-x keeps the per-cell DMA to
    the weight planes only (the decode kernel's traffic pattern) while the
    MXU amortizes the dequant over all M rows.
    """
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc_f = sc_ref[:].astype(jnp.float32)
    sc = _repeat_scales(sc_f)
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc).astype(w_dtype)

    off = k_idx * bkh
    x_lo = x_lo_ref[:, pl.ds(off, bkh)].astype(w_dtype)
    x_hi = x_hi_ref[:, pl.ds(off, bkh)].astype(w_dtype)
    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32,
                  precision=prec)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32,
                   precision=prec)
    out_ref[:] += acc + _corr_dot(bs_ref[:], sc_f)


def _q4mm_prefill_nat_kernel(x_ref, qs_ref, sc_ref, out_ref, *,
                             bk: int, w_dtype):
    """Natural-order bf16 prefill body: x stays UNSPLIT (resident [M, K]),
    the dequantized weight halves are interleaved back to natural K order
    on the sublane axis, and the -8 offset is subtracted in-kernel (int
    sub pre-cast) instead of offset-folded — so the host passes x as-is:
    no split_activation planes, no bsum reduce. One MXU dot per k step.
    The interleave + subtract are VPU work per WEIGHT tile, amortized over
    all M rows (measured free at M=512: int8 nat == split, 172.8 vs
    172.5 us/call). Grid (M/mc, N/bn, K/bk): rows are chunked INSIDE the
    grid (x block [mc, K] per row-chunk) so large M needs no host-side
    chunk/concat pass (round 5: the concat materialized the fused w13
    output, ~8.4 ms/step at T=1024)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    w_lo = (((qs & 0x0F) - 8).astype(jnp.float32) * sc).astype(w_dtype)
    w_hi = (((qs >> 4) - 8).astype(jnp.float32) * sc).astype(w_dtype)
    bkh, bn = w_lo.shape
    nb = bkh // HALF
    w_nat = jnp.concatenate(
        [w_lo.reshape(nb, HALF, bn), w_hi.reshape(nb, HALF, bn)],
        axis=1).reshape(2 * bkh, bn)

    x = x_ref[:, pl.ds(k_idx * bk, bk)].astype(w_dtype)
    prec = _dot_precision(w_dtype)
    out_ref[:] += jnp.dot(x, w_nat, preferred_element_type=jnp.float32,
                          precision=prec)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                              "interpret", "w_dtype",
                                              "variant"))
def q4_matmul_prefill_pallas(x: jax.Array, qs: jax.Array, scales: jax.Array,
                             *, block_n: int = 0, block_k: int = 0,
                             interpret: bool = False,
                             w_dtype=jnp.bfloat16,
                             variant: str = "nat") -> jax.Array:
    """Large-M fused dequant-matmul: y[M, N] = x[M, K] @ dequant(W); f32.

    Replaces the XLA dequant-then-dot prefill path (which materializes the
    full bf16 dense matrix through HBM — ~37% MXU at 7B/512). x stays
    resident in VMEM; weights stream k-blocked; grid (N/bn, K/bk) with the
    reduction innermost so the out tile stays resident across k steps.
    """
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)
    # rows are chunked inside the grid: the RESIDENT x block covers mc rows
    mc = m if m <= _PREFILL_CHUNK_M else _PREFILL_CHUNK_M
    assert m % mc == 0, (m, mc)
    # itemsize of the RESIDENT x operand (callers cast to w_dtype before the
    # call) — must match what prefill_shapes_supported validated
    bn = block_n or _pick_tile(n, cap=_prefill_bn(mc, k, x.dtype.itemsize,
                                                  chunked=m > mc))
    bk = block_k or _pick_tile_k(k, cap=2048)
    bkh = bk // 2
    grid = (m // mc, n // bn, k // bk)

    qs_spec = pl.BlockSpec((bkh, bn), lambda mi, i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda mi, i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=kh * n + (k // QBLOCK) * n * 4 + m * k * 2 + m * n * 4,
        transcendentals=0,
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((mc, bn), lambda mi, i, kk: (mi, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=cost,
        interpret=interpret,
    )

    if variant == "nat":
        # x passes UNSPLIT and as-is (no split planes, no bsum reduce);
        # the [mc, K] row-chunk block stays resident across its n/k cells.
        x_spec = pl.BlockSpec((mc, k), lambda mi, i, kk: (mi, 0),
                              memory_space=pltpu.VMEM)
        kernel = functools.partial(_q4mm_prefill_nat_kernel,
                                   w_dtype=w_dtype, bk=bk)
        return pl.pallas_call(
            kernel, in_specs=[x_spec, qs_spec, sc_spec], **common,
        )(x, qs, scales)

    # legacy "split" variant (round-3/4 A/B reference): 2D grid, whole-M
    # resident halves — m <= _PREFILL_CHUNK_M only
    assert m == mc, ("the split variant predates in-grid row chunking; "
                     "use variant='nat' for large M")
    x_lo, x_hi = split_activation(x)
    bsum = x.astype(jnp.float32).reshape(m, k // QBLOCK, QBLOCK).sum(-1).T

    common["grid"] = (n // bn, k // bk)
    common["out_specs"] = pl.BlockSpec((m, bn), lambda i, kk: (0, i),
                                       memory_space=pltpu.VMEM)
    common["compiler_params"] = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT)
    qs_spec = pl.BlockSpec((bkh, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    # x_lo/x_hi blocks are the FULL arrays with a constant index_map: Mosaic
    # fetches them once and keeps them resident across every grid cell.
    x_spec = pl.BlockSpec((m, kh), lambda i, kk: (0, 0),
                          memory_space=pltpu.VMEM)
    bs_spec = pl.BlockSpec((bk // QBLOCK, m), lambda i, kk: (kk, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_q4mm_prefill_kernel, w_dtype=w_dtype, bkh=bkh)
    return pl.pallas_call(
        kernel,
        in_specs=[x_spec, x_spec, bs_spec, qs_spec, sc_spec],
        **common,
    )(x_lo, x_hi, bsum, qs, scales)


def _q4mm_prefill_int8_kernel(x_lo_ref, x_hi_ref, dx_ref, s8_ref, qs_ref,
                              sc_ref, out_ref, acc_scr, *, bkh: int, nk: int):
    """Int8-MXU prefill body: the TPU re-design of the reference's
    activation-quantized matmul (q8_0 activations x q4 weights,
    /root/reference/lib/ggml.c:8105-8119 + the SIMD dot kernels at
    2368-3040). ggml keeps the exact per-32-block scales and rides CPU SIMD
    int8 dot instructions at 32-element granularity; the MXU instead wants
    ONE deep reduction, so the scales are factored per-AXIS: activations
    carry a per-row scale dx[m] (dynamic symmetric int8), weights a
    per-column scale S8[n] (folded into the scale plane on the host of the
    kernel: sc_ref holds s[b,n]/S8[n]). The kernel requantizes codes to
    int8 in VMEM — round((q-8) * s/S8) in [-127, 127] by construction —
    and accumulates in int32 at the MXU's 2x int8 rate. The per-axis
    rescale y = acc * dx[m] * S8[n] happens IN-KERNEL at the last k step
    (an int32 [M, N] output rescaled by an XLA consumer measured ~5 ms/step
    of pure i32-read/f32-write traffic at 7B/512); the int32 accumulator
    lives in scratch so f32 rounding never touches partial sums.

    vs the exact bf16 path: adds bounded requant error (weights <= S8/2
    absolute ~ 0.4% of the column amax; activations ~ 0.4% of the row
    amax) — dispatched only under FASTLLAMA_PREFILL_INT8 until measured
    end-to-end."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    w_lo = jnp.round(((qs & 0x0F) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)
    w_hi = jnp.round(((qs >> 4) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)

    off = k_idx * bkh
    x_lo = x_lo_ref[:, pl.ds(off, bkh)]
    x_hi = x_hi_ref[:, pl.ds(off, bkh)]
    acc = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.int32)
    acc_scr[:] += acc

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[:] = (acc_scr[:].astype(jnp.float32)
                      * dx_ref[:] * s8_ref[:])


def _q4mm_prefill_int8_nat_kernel(xq_ref, dx_ref, s8_ref, qs_ref, sc_ref,
                                  out_ref, acc_scr, *, bk: int, nk: int):
    """Natural-order int8 prefill body: x stays UNSPLIT ([M, K] int8,
    resident) and the requantized weight halves are interleaved back to
    natural K order IN-KERNEL on the sublane axis (reshape/concat on
    sublanes — no lane shuffles), so each k step is ONE int8 MXU dot.
    Kills the host-side split_activation materialization (2 int8 planes +
    their copies per call, ~2-3 ms/step at 7B/512). The sublane interleave
    is VPU work per WEIGHT tile — amortized over all M rows (the same
    trick measured 12.6 us/call WORSE for the M=8 decode kernel, round 2:
    'in-kernel natural-order interleave'; at M=512 the MXU dominates)."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    w_lo = jnp.round(((qs & 0x0F) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)
    w_hi = jnp.round(((qs >> 4) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)
    bkh, bn = w_lo.shape
    nb = bkh // HALF
    w_nat = jnp.concatenate(
        [w_lo.reshape(nb, HALF, bn), w_hi.reshape(nb, HALF, bn)],
        axis=1).reshape(2 * bkh, bn)

    xq = xq_ref[:, pl.ds(k_idx * bk, bk)]
    acc_scr[:] += jnp.dot(xq, w_nat, preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[:] = (acc_scr[:].astype(jnp.float32)
                      * dx_ref[:] * s8_ref[:])


def _quant_rows_kernel(x_ref, xq_ref, dx_ref):
    """Per-row symmetric int8 activation quant: one pass over x producing
    the int8 plane and the per-row scale dx — the fused TPU replacement for
    the XLA abs/max/div/round/clip chain (which materialized an f32
    quotient plane + the int8 plane per matmul call, ~4 ms/step at 7B/512;
    the reference fuses its q8_0 analog into the matmul's TASK_INIT phase,
    lib/ggml.c:8105-8119)."""
    xf = x_ref[:].astype(jnp.float32)
    dx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                     1e-20) / 127.0
    xq_ref[:] = jnp.clip(jnp.round(xf / dx), -127, 127).astype(jnp.int8)
    dx_ref[:] = dx


def _quant_rows_bm(m: int, k: int, itemsize: int) -> int:
    """Row-block: the largest 32-multiple divisor of m whose x block stays
    ~<= 3 MB (int8 output tiling wants sublane multiples of 32; Mosaic
    double-buffers both streamed blocks, so the scoped-VMEM footprint is
    ~2*(in + in/4) — a 6 MB block measured 19.2M scoped and OOM'd)."""
    best = 0
    d = 32
    while d <= m:
        if m % d == 0 and d * k * itemsize <= 3 * 1024 * 1024:
            best = d
        d += 32
    return best


def quant_rows_supported(m: int, k: int, itemsize: int) -> bool:
    return k % 128 == 0 and m % 32 == 0 and _quant_rows_bm(m, k, itemsize) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_rows_int8(x: jax.Array, *, interpret: bool = False
                    ) -> tuple[jax.Array, jax.Array]:
    """x [M, K] float -> (xq int8 [M, K], dx f32 [M, 1]); Pallas one-pass."""
    m, k = x.shape
    bm = _quant_rows_bm(m, k, x.dtype.itemsize)
    grid = (m // bm,)
    return pl.pallas_call(
        _quant_rows_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, k), jnp.int8),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        interpret=interpret,
    )(x)


def _q4mm_prefill_int8_strip_kernel(xq_ref, dx_ref, qs_ref, strip_ref,
                                    out_ref, acc_scr, s8_scr, inv_scr, *,
                                    bk: int, nk: int):
    """Round-5 int8 prefill body: the per-column weight bound s8 and the
    normalized scales are derived IN-KERNEL from a resident full-K scale
    strip ([K/32, bn], constant-in-k index map), so the host of the kernel
    does NO scale work at all — the round-4 revision's XLA-side s8 reduce +
    sc/s8 normalization re-read and re-wrote the entire 0.78 GB scale plane
    every step (~2 ms at 7B/512). The strip costs the same scale bytes the
    per-k streaming did, once per n tile. sc * (1/s8) (reciprocal computed
    once at k==0) replaces sc/s8 — <=1 ulp from the divide, mirrored
    exactly by the CPU emulation. Natural-order weight interleave and the
    i32 scratch accumulator as before; grid (M/mc, N/bn, K/bk) with rows
    chunked inside the grid (see _q4mm_prefill_nat_kernel)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        s8 = jnp.maximum(jnp.max(jnp.abs(strip_ref[:]), axis=0,
                                 keepdims=True) * (8.0 / 127.0), 1e-20)
        s8_scr[:] = s8
        inv_scr[:] = 1.0 / s8

    nbk = bk // QBLOCK
    sc_raw = strip_ref[pl.ds(k_idx * nbk, nbk), :]
    sc = _repeat_scales(sc_raw * inv_scr[:])
    qs = qs_ref[:].astype(jnp.int32)
    w_lo = jnp.round(((qs & 0x0F) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)
    w_hi = jnp.round(((qs >> 4) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int8)
    bkh, bn = w_lo.shape
    nb = bkh // HALF
    w_nat = jnp.concatenate(
        [w_lo.reshape(nb, HALF, bn), w_hi.reshape(nb, HALF, bn)],
        axis=1).reshape(2 * bkh, bn)

    xq = xq_ref[:, pl.ds(k_idx * bk, bk)]
    acc_scr[:] += jnp.dot(xq, w_nat, preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[:] = (acc_scr[:].astype(jnp.float32)
                      * dx_ref[:] * s8_scr[:])


def _q4mm_prefill_int8_pipe_kernel(xq_ref, dx_ref, qs_ref, strip_ref,
                                   out_ref, acc_scr, s8_scr, inv_scr, w_scr,
                                   *, bk: int, nk: int):
    """Software-pipelined strip kernel (experimental variant "natp"): the
    grid runs nk+1 k-steps; step kk requants weight tile kk into scratch
    bank kk%2 (VPU) while the MXU dots tile kk-1 from the other bank —
    the two have no data dependency, so Mosaic may overlap them (the
    in-cell requant chain costs ~12% of the MXU cycles at M=512; the
    fused kernel measures 79% of the int8 MXU ideal)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        s8 = jnp.maximum(jnp.max(jnp.abs(strip_ref[:]), axis=0,
                                 keepdims=True) * (8.0 / 127.0), 1e-20)
        s8_scr[:] = s8
        inv_scr[:] = 1.0 / s8

    @pl.when(k_idx < nk)
    def _():
        nbk = bk // QBLOCK
        sc_raw = strip_ref[pl.ds(k_idx * nbk, nbk), :]
        sc = _repeat_scales(sc_raw * inv_scr[:])
        qs = qs_ref[:].astype(jnp.int32)
        w_lo = jnp.round(((qs & 0x0F) - 8).astype(jnp.float32) * sc
                         ).astype(jnp.int8)
        w_hi = jnp.round(((qs >> 4) - 8).astype(jnp.float32) * sc
                         ).astype(jnp.int8)
        bkh, bn = w_lo.shape
        nb = bkh // HALF
        w_scr[k_idx % 2] = jnp.concatenate(
            [w_lo.reshape(nb, HALF, bn), w_hi.reshape(nb, HALF, bn)],
            axis=1).reshape(2 * bkh, bn)

    @pl.when(k_idx > 0)
    def _():
        kd = k_idx - 1
        xq = xq_ref[:, pl.ds(kd * bk, bk)]
        acc_scr[:] += jnp.dot(xq, w_scr[kd % 2],
                              preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk)
    def _():
        out_ref[:] = (acc_scr[:].astype(jnp.float32)
                      * dx_ref[:] * s8_scr[:])


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                              "interpret", "variant"))
def q4_matmul_prefill_int8(x: jax.Array, qs: jax.Array, scales: jax.Array,
                           *, block_n: int = 0, block_k: int = 0,
                           interpret: bool = False,
                           variant: str = "nat") -> jax.Array:
    """Activation-quantized large-M matmul: y ~= x @ dequant(W); f32 out.

    Same resident-x grid as q4_matmul_prefill_pallas; the MXU runs int8.
    """
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)
    # rows are chunked inside the grid; resident x is the int8 plane
    # (itemsize 1 — the float input is quantized before the pallas_call)
    mc = m if m <= _PREFILL_CHUNK_M else _PREFILL_CHUNK_M
    assert m % mc == 0, (m, mc)
    bn = block_n or _pick_tile(n, cap=_prefill_bn(mc, k, 1,
                                                  chunked=m > mc))
    bk = block_k or _pick_tile_k(k, cap=2048)
    bkh = bk // 2
    grid = (m // mc, n // bn, k // bk)

    dx_spec = pl.BlockSpec((mc, 1), lambda mi, i, kk: (mi, 0),
                           memory_space=pltpu.VMEM)
    qs_spec = pl.BlockSpec((bkh, bn), lambda mi, i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=kh * n + (k // QBLOCK) * n * 4 + m * k + m * n * 4,
        transcendentals=0,
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((mc, bn), lambda mi, i, kk: (mi, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=cost,
        interpret=interpret,
    )

    if variant in ("nat", "natp"):
        # Default path: fused one-pass activation quant (Pallas prep
        # kernel), raw scales in (s8/normalization derived in-kernel from
        # the resident strip) — the host does no per-call scale or quant
        # chains at all.
        if quant_rows_supported(m, k, x.dtype.itemsize):
            xq, dx2 = quant_rows_int8(x, interpret=interpret)
        else:
            xf = x.astype(jnp.float32)
            dx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1,
                                     keepdims=True), 1e-20) / 127.0
            xq = jnp.clip(jnp.round(xf / dx), -127, 127).astype(jnp.int8)
            dx2 = dx
        x_spec = pl.BlockSpec((mc, k), lambda mi, i, kk: (mi, 0),
                              memory_space=pltpu.VMEM)
        strip_spec = pl.BlockSpec((k // QBLOCK, bn),
                                  lambda mi, i, kk: (0, i),
                                  memory_space=pltpu.VMEM)
        nk = k // bk
        if variant == "natp":
            # software-pipelined: nk+1 k-steps; the qs tile index clamps
            # on the extra final step (fetched but unused)
            common["grid"] = (m // mc, n // bn, nk + 1)
            qs_spec = pl.BlockSpec(
                (bkh, bn),
                lambda mi, i, kk: (jnp.minimum(kk, nk - 1), i),
                memory_space=pltpu.VMEM)
            kernel = functools.partial(_q4mm_prefill_int8_pipe_kernel,
                                       bk=bk, nk=nk)
            return pl.pallas_call(
                kernel,
                in_specs=[x_spec, dx_spec, qs_spec, strip_spec],
                scratch_shapes=[pltpu.VMEM((mc, bn), jnp.int32),
                                pltpu.VMEM((1, bn), jnp.float32),
                                pltpu.VMEM((1, bn), jnp.float32),
                                pltpu.VMEM((2, bk, bn), jnp.int8)],
                **common,
            )(xq, dx2, qs, scales)
        kernel = functools.partial(_q4mm_prefill_int8_strip_kernel, bk=bk,
                                   nk=nk)
        return pl.pallas_call(
            kernel,
            in_specs=[x_spec, dx_spec, qs_spec, strip_spec],
            scratch_shapes=[pltpu.VMEM((mc, bn), jnp.int32),
                            pltpu.VMEM((1, bn), jnp.float32),
                            pltpu.VMEM((1, bn), jnp.float32)],
            **common,
        )(xq, dx2, qs, scales)

    # Round-4 revisions, kept for A/B: "natx" = natural-order kernel with
    # the XLA-side quant chain + normalized scale plane; "split" = split-K
    # int8 halves as two operands. Both predate in-grid row chunking:
    # 2D grid, whole-M resident.
    assert m == mc, ("natx/split variants support m <= _PREFILL_CHUNK_M; "
                     "use variant='nat' for large M")
    s8 = jnp.maximum(jnp.max(jnp.abs(scales), axis=0) * (8.0 / 127.0), 1e-20)
    sc_norm = scales / s8[None, :]
    xf = x.astype(jnp.float32)
    dx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-20) / 127.0

    common["grid"] = (n // bn, k // bk)
    common["out_specs"] = pl.BlockSpec((m, bn), lambda i, kk: (0, i),
                                       memory_space=pltpu.VMEM)
    common["compiler_params"] = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT)
    dx_spec = pl.BlockSpec((m, 1), lambda i, kk: (0, 0),
                           memory_space=pltpu.VMEM)
    qs_spec = pl.BlockSpec((bkh, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    s8_spec = pl.BlockSpec((1, bn), lambda i, kk: (0, i),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i),
                           memory_space=pltpu.VMEM)
    common["scratch_shapes"] = [pltpu.VMEM((m, bn), jnp.int32)]

    def q8(v):
        return jnp.clip(jnp.round(v / dx[:, None]), -127, 127
                        ).astype(jnp.int8)

    if variant == "natx":
        # unsplit x; the kernel interleaves the weight halves to natural
        # K order on the sublane axis instead
        xq = q8(xf)
        x_spec = pl.BlockSpec((m, k), lambda i, kk: (0, 0),
                              memory_space=pltpu.VMEM)
        kernel = functools.partial(_q4mm_prefill_int8_nat_kernel, bk=bk,
                                   nk=k // bk)
        return pl.pallas_call(
            kernel,
            in_specs=[x_spec, dx_spec, s8_spec, qs_spec, sc_spec],
            **common,
        )(xq, dx[:, None], s8[None, :], qs, sc_norm)

    # "split" variant: quantized halves as two operands
    x_lo, x_hi = split_activation(xf)
    xq_lo, xq_hi = q8(x_lo), q8(x_hi)
    x_spec = pl.BlockSpec((m, kh), lambda i, kk: (0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_q4mm_prefill_int8_kernel, bkh=bkh,
                               nk=k // bk)
    return pl.pallas_call(
        kernel,
        in_specs=[x_spec, x_spec, dx_spec, s8_spec, qs_spec, sc_spec],
        **common,
    )(xq_lo, xq_hi, dx[:, None], s8[None, :], qs, sc_norm)


def q4_matmul_int8_xla(x: jax.Array, qs: jax.Array,
                       scales: jax.Array) -> jax.Array:
    """Exact-semantics XLA emulation of the int8 prefill kernel.

    Reproduces q4_matmul_prefill_int8's arithmetic step for step — the same
    per-column S8 / per-row dx scale factoring, the same requantization
    rounding (jnp.round half-to-even), the same sc * (1/S8) reciprocal
    normalization, exact int32 accumulation, and the same (acc*dx)*s8
    rescale order — so ``prefill_int8=True`` means the same numbers on
    every backend (exact int32 accumulators; the final f32 rescale may
    differ by how XLA fuses the two multiplies, <= 2 ulp). Used on CPU (tests, the ppl-gate quality harness) and as
    the TPU fallback when the kernel's shape guard rejects; the Pallas
    kernel is the performance path. (Only divergence: when the resident-x
    byte budget splits K into parts — T >= 1024 at 7B dims — each part
    derives s8 from its own K range; the noise envelope is unchanged.)"""
    s8 = jnp.maximum(jnp.max(jnp.abs(scales), axis=0, keepdims=True)
                     * (8.0 / 127.0), 1e-20)
    sc = _repeat_scales((scales * (1.0 / s8)).astype(jnp.float32))
    qsw = qs.astype(jnp.int32)
    w_lo = jnp.round(((qsw & 0x0F) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int32)
    w_hi = jnp.round(((qsw >> 4) - 8).astype(jnp.float32) * sc
                     ).astype(jnp.int32)
    xf = x.astype(jnp.float32)
    dx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-20) / 127.0
    xq = jnp.clip(jnp.round(xf / dx[:, None]), -127, 127).astype(jnp.int32)
    x_lo, x_hi = split_activation(xq)
    acc = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * dx[:, None] * s8


def q4_matmul_xla(x: jax.Array, w: QuantMatmulWeight,
                  w_dtype=jnp.bfloat16) -> jax.Array:
    """Dequant-then-dot; XLA fuses the dequant chain into the matmul.
    x must already be padded to w's stored K; output is padded-N wide."""
    dense = dequant_matmul_weight(w, dtype=w_dtype)
    return jnp.dot(x.astype(w_dtype), dense, preferred_element_type=jnp.float32,
                   precision=_dot_precision(w_dtype))


# Heuristic crossover: below this M the op is HBM-bound and the DECODE
# Pallas kernel wins by never materializing dense weights; above it the
# dedicated prefill kernels take over (resident-x bf16 / int8 — see the
# prefill dispatch above). MEASURED (don't redo): the decode kernel at
# M=512 under VMEM-safe (512, 2048) tiles ran the 7B prefill at 170.8 ms
# wall vs XLA's 130 — weight-stationary re-reads x per N tile and its VPU
# dequant can't amortize over M. The resident-x kernel fixes exactly that
# (round 4: 68.4 ms device vs XLA's 71.1 at 7B/512; int8 42.9).
_PALLAS_MAX_M = 64


def _k_split_point(k: int) -> int | None:
    """For K with no large 256-multiple tile divisor (e.g. 7B's n_ff=11008,
    whose best divisor is 256 — 43 sequential micro-steps ran the w2 matmul
    at ~257 GB/s vs ~430+ with bk=2816), split the reduction into two kernel
    calls at a 2816-multiple boundary so both parts get big K tiles. Returns
    the split point, or None when a single call already tiles well."""
    if _pick_tile_k(k) >= 1024 or k <= 2816:
        return None
    k0 = (k // 2816) * 2816
    if k0 == 0 or k == k0:
        return None
    return k0


def _bn_cap(m: int) -> int:
    """N tile cap: 1024 for decode-size M; 512 for prefill-size M so the
    x/out tiles ([M, BK/2] / [M, BN]) still fit the 16 MB scoped-VMEM
    budget (M=512 at (1024, 2048) tiles measured 18.9M and was rejected)."""
    return 1024 if m <= 64 else 512


def _bk_cap(m: int) -> int:
    """Large-M calls take the whole K when it divides (k<=4096): the out
    tile is then written once instead of read-modify-written per k-step —
    (512, 4096->12288) measured 326 us vs 416 at bk=2048 (MXU ideal 262).
    Decode M gets whole-K only under the FASTLLAMA_WHOLEK experiment."""
    return (4096 if _WHOLEK else 2816) if m <= 64 else 4096


def pallas_shapes_supported(k: int, n: int, m: int = 8) -> bool:
    """Mosaic requires the last two block dims to be (8, 128)-divisible or
    equal to the full array dims. Small/unaligned models (tests, exotic
    shards) fall back to the XLA path."""
    bn = _pick_tile(n, cap=_bn_cap(m))
    bk = _pick_tile_k(k, cap=_bk_cap(m), n=n)
    kh = k // 2
    bkh = bk // 2
    ok_x = (bkh % 128 == 0) or (bkh == kh)           # x_lo/x_hi last dim
    ok_qs_lane = (bn % 128 == 0) or (bn == n)
    ok_qs_sub = (bkh % 8 == 0) or (bkh == kh)
    nb_blk = bk // QBLOCK
    ok_sc_sub = (nb_blk % 8 == 0) or (nb_blk == k // QBLOCK)
    return ok_x and ok_qs_lane and ok_qs_sub and ok_sc_sub


# Prefill dispatch bounds: the resident-x kernel needs M*K bf16 bytes of
# VMEM headroom (budget 16 MB; temps/out take the rest) and M large enough
# that the MXU amortizes the in-kernel dequant.
_PREFILL_MIN_M = 256
_PREFILL_X_BYTES_MAX = 10 * 1024 * 1024
# Rows per kernel invocation: M beyond this is row-chunked into independent
# calls (outputs concatenate — no partial-sum traffic, unlike K parts).
# 512 is the thoroughly measured configuration (79% of the int8 MXU ideal
# at 7B dims); M=1024 single-call tiles OOM'd scoped VMEM by ~1 MB (the
# out/acc tiles scale with M), and at prefill sizes the kernel is
# MXU-bound, so chunking scales ~linearly.
_PREFILL_CHUNK_M = 512


def _prefill_kernel_enabled() -> bool:
    """FASTLLAMA_PREFILL_KERNEL=0 pins prefill to the XLA path (escape
    hatch while the resident-x kernel's remote-compiler behavior is
    validated per shape; round-3's whole-K variant crashed it)."""
    import os
    return os.environ.get("FASTLLAMA_PREFILL_KERNEL", "1") != "0"


# Default for the activation-quantized int8 prefill path when neither the
# config (prefill_int8 tri-state) nor FASTLLAMA_PREFILL_INT8 decides.
# Applies only to production bf16 runs — f32 weight mode is the bit-faithful
# parity contract and never silently requantizes.
#
# ON by default (round 5): measured end-to-end on the worst-case random
# tiny-model harness, the int8 path's quality cost is INSIDE the q4_0
# quantization gate's own margin (|dlog ppl| int8-vs-exact 0.013 vs
# q4-vs-f32 0.018; prefill logits corr 0.9995 — tests/test_perplexity_gate
# .py::test_int8_prefill_ppl_within_gate), and the reference runs its q8_0
# activation-quant analog unconditionally (lib/ggml.c:8105-8119), so
# default-on is the parity-faithful choice. RuntimeConfig(prefill_int8=
# False) or FASTLLAMA_PREFILL_INT8=0 pins the bit-faithful bf16 path.
_PREFILL_INT8_DEFAULT = True


def _bf16_prefill_max_m() -> int:
    """Crossover bound for the bf16 resident-x kernel vs the XLA dequant
    path (measured round 5; FASTLLAMA_BF16_PREFILL_MAX_M re-opens the
    experiment)."""
    import os
    return int(os.environ.get("FASTLLAMA_BF16_PREFILL_MAX_M", "2048"))


def _prefill_int8_forced() -> bool:
    """True when FASTLLAMA_PREFILL_INT8=1 explicitly forces the int8 path
    (honored on any backend, via the exact emulation if need be)."""
    import os
    return os.environ.get("FASTLLAMA_PREFILL_INT8") == "1"


def _prefill_int8_enabled(w_dtype=jnp.bfloat16) -> bool:
    """FASTLLAMA_PREFILL_INT8=1/0 force the activation-quantized int8
    prefill path on/off (2x MXU rate, ~0.4% bounded requant noise on
    weights/activations — the reference runs its q8_0 analog always-on,
    lib/ggml.c:8105-8119). Unset: _PREFILL_INT8_DEFAULT, bf16 mode only."""
    import os
    v = os.environ.get("FASTLLAMA_PREFILL_INT8")
    if v is not None:
        return v == "1"
    return _PREFILL_INT8_DEFAULT and jnp.dtype(w_dtype) != jnp.float32


def _prefill_bn(m: int, k: int, itemsize: int = 2,
                chunked: bool = False) -> int:
    """N tile for the prefill kernel: 512 normally; 256 when the resident
    x already eats most of the VMEM budget (w2-size K after the k-split).
    In-grid row chunking (chunked=True, mg > 1) double-buffers the
    resident block across row chunks, so the threshold halves (the
    (mc=512, K=11264, bn=512) tile set measured 16.64M scoped — 656K
    over — at mg=2 while fitting at mg=1)."""
    lim = (4 if chunked else 6) * 1024 * 1024
    return 256 if m * k * itemsize > lim else 512


def prefill_shapes_supported(k: int, n: int, m: int,
                             itemsize: int = 2,
                             chunked: bool = False) -> bool:
    if m % 8 or m * k * itemsize > _PREFILL_X_BYTES_MAX:
        return False
    bn = _pick_tile(n, cap=_prefill_bn(m, k, itemsize, chunked))
    bk = _pick_tile_k(k, cap=2048)
    return (bn % 128 == 0 or bn == n) and bk % 256 == 0 and k % bk == 0


def _prefill_k_parts(k_stored: int, m: int, itemsize: int,
                     chunked: bool = False
                     ) -> tuple[tuple[int, int], ...] | None:
    """K ranges for the resident-x prefill kernel such that each part's
    x slice fits the VMEM byte budget (round-4: 7B's w2 K=11264 at M=512
    bf16 is 11.5 MB > 10 — it fell back to the XLA dequant path, ~14 ms of
    the 47 ms int8-prefill step). Boundaries stay multiples of 2048 so each
    part keeps large bk tiles; None when even a 2048-deep slice is over
    budget (caller falls back to XLA)."""
    # in-grid row chunking double-buffers the resident block across row
    # chunks: a (mc=512, K=10240) bf16 part measured 21.6M scoped at mg=2,
    # and a 6 MB budget still left a (512, 6144) bf16 part 350K over.
    # 5.5 MiB admits exactly the proven (512, K=11264) int8 single-part w2
    # (5767168 bytes) while pushing bf16 K-parts down to <=4096.
    budget = (11 * 1024 * 1024) // 2 if chunked else _PREFILL_X_BYTES_MAX
    budget_k = budget // max(m * itemsize, 1)
    if k_stored * 1 <= 0 or budget_k < 2048:
        return None
    if k_stored % 256:
        return None
    parts = []
    a = 0
    while a < k_stored:
        rem = k_stored - a
        if rem * m * itemsize <= budget:
            step = rem
        else:
            step = (budget_k // 2048) * 2048
        parts.append((a, a + step))
        a += step
    return tuple(parts)


def q4_matmul(x: jax.Array, w: QuantMatmulWeight, *,
              use_pallas: bool | None = None,
              w_dtype=jnp.bfloat16,
              prefill_int8: bool | None = None,
              interpret: bool = False) -> jax.Array:
    """Dispatching entry point. x: [..., K_logical] -> [..., N_logical] f32.

    Handles stored-dim padding transparently: zero-pads x up to the weight's
    stored K (inert: padded codes dequantize to 0) and slices the output to
    n_logical.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    # Under shard_map the arrays are local shards while the static n_logical
    # aux stays global — the effective width is then the (unpadded) local
    # shard width. Sharded weights must be unpadded (parallel/sharding.py
    # asserts this); standard LLaMA dims are all 256-multiples anyway.
    n_eff = min(w.n_logical, w.qs.shape[1])

    k_stored = w.qs.shape[0] * 2
    if k_stored != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_stored - k)))

    # Large-M (prefill) path: resident-x fused kernel. Only q4_0 (mins-free)
    # weights; q4_1/GPTQ prefill stays on the XLA path.
    prefill_size = m >= _PREFILL_MIN_M and w.mins is None
    # int8 FORCED (explicit config True, or FASTLLAMA_PREFILL_INT8=1) means
    # int8 semantics on any backend (the exact XLA emulation stands in when
    # the kernel path isn't taken — CPU quality tests rely on it). The
    # silent DEFAULT-on only rides the kernel dispatch: the escape hatches
    # (FASTLLAMA_PREFILL_KERNEL=0, use_pallas=False) keep meaning the
    # bit-faithful XLA dequant they always meant.
    int8_forced = (bool(prefill_int8) if prefill_int8 is not None
                   else _prefill_int8_forced())
    use_int8 = prefill_size and (
        int8_forced or (prefill_int8 is None
                        and _prefill_int8_enabled(w_dtype)))
    prefill = (prefill_size and _prefill_kernel_enabled()
               and (use_pallas or (use_pallas is None
                                   and jax.default_backend() == "tpu")))
    if use_int8 and not int8_forced and not prefill:
        use_int8 = False
    # Dispatch crossover (measured same-day, 7B dims, round 5, with
    # in-grid row chunking): the bf16 resident-x kernel beats the XLA
    # dequant path at every measured M — 51.6/110.6/236.3 ms/step vs
    # XLA's 71.1/123.3/246.2 at M=512/1024/2048 — but the margin shrinks
    # with M (1.38x -> 1.11x -> 1.04x: chunked k-parts pay partial-sum
    # adds while XLA's dense dequant amortizes). Beyond the measured
    # range the trend would cross: bf16 falls back to XLA above 2048.
    # The int8 path wins big everywhere (32.0/86.1/198.3).
    if prefill and not use_int8 and m > _bf16_prefill_max_m():
        prefill = False
    if prefill:
        n_stored = w.qs.shape[1]
        itemsize = 1 if use_int8 else jnp.dtype(w_dtype).itemsize
        m_run = (_PREFILL_CHUNK_M
                 if m > _PREFILL_CHUNK_M and m % _PREFILL_CHUNK_M == 0
                 else m)
        parts = _prefill_k_parts(k_stored, m_run, itemsize,
                                 chunked=m > m_run)
        if parts is not None and m_run <= _PREFILL_CHUNK_M and all(
                prefill_shapes_supported(b - a, n_stored, m_run, itemsize,
                                         chunked=m > m_run)
                for a, b in parts):
            fn = (q4_matmul_prefill_int8 if use_int8
                  else functools.partial(q4_matmul_prefill_pallas,
                                         w_dtype=w_dtype))
            # cast to the MXU dtype BEFORE the split: the kernel casts
            # in-VMEM anyway, and f32 operands would double both the
            # resident-x VMEM footprint (the byte budget assumes itemsize)
            # and the split's materialization copies
            xp = x2 if use_int8 else x2.astype(w_dtype)
            # rows beyond _PREFILL_CHUNK_M are chunked INSIDE the kernel
            # grid (m dimension with per-chunk resident x) — no host-side
            # chunk/concat pass (the concat materialized the fused w13
            # output, ~8.4 ms/step at T=1024)
            y = None
            for a, b in parts:
                yp = fn(xp[:, a:b], w.qs[a // 2: b // 2],
                        w.scales[a // QBLOCK: b // QBLOCK],
                        interpret=interpret)
                y = yp if y is None else y + yp
            if y.shape[-1] != n_eff:
                y = y[:, :n_eff]
            return y.reshape(*lead, n_eff)

    if use_int8:
        # int8 semantics were requested but the Pallas path was not taken
        # (CPU backend, or the kernel's shape guard rejected): the exact
        # XLA emulation keeps prefill_int8=True meaning the same arithmetic
        # on every backend — quality tests on CPU measure the TPU path.
        y = q4_matmul_int8_xla(x2, w.qs, w.scales)
        if y.shape[-1] != n_eff:
            y = y[:, :n_eff]
        return y.reshape(*lead, n_eff)

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu") and m <= _PALLAS_MAX_M
    if use_pallas and not pallas_shapes_supported(k_stored, w.qs.shape[1], m):
        use_pallas = False
    if use_pallas and m > _PALLAS_MAX_M:
        # explicit use_pallas=True at prefill M lands here only when the
        # prefill kernel's shape guard rejected; decode tiles at large M
        # measured slower than XLA (see _PALLAS_MAX_M note)
        use_pallas = False
    if use_pallas:
        # Pad M up to the f32 sublane tile so tiny decode batches map cleanly.
        m_pad = max(8, -(-m // 8) * 8)
        if m_pad != m:
            x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

        def run(xp, qs, scales, mins):
            if mins is None:
                return q4_matmul_pallas(xp, qs, scales, interpret=interpret,
                                        w_dtype=w_dtype)
            return q41_matmul_pallas(xp, qs, scales, mins,
                                     interpret=interpret, w_dtype=w_dtype)

        k0 = _k_split_point(k_stored)
        if k0 is not None:
            # split-K packing slices cleanly at 32-block boundaries: qs row
            # k0/2 and scale row k0/32 both start a fresh block
            y = run(x2[:, :k0], w.qs[: k0 // 2], w.scales[: k0 // QBLOCK],
                    None if w.mins is None else w.mins[: k0 // QBLOCK])
            y += run(x2[:, k0:], w.qs[k0 // 2:], w.scales[k0 // QBLOCK:],
                     None if w.mins is None else w.mins[k0 // QBLOCK:])
            y = y[:m]
        else:
            y = run(x2, w.qs, w.scales, w.mins)[:m]
    else:
        y = q4_matmul_xla(x2, w, w_dtype=w_dtype)
    if y.shape[-1] != n_eff:
        y = y[:, :n_eff]
    return y.reshape(*lead, n_eff)
