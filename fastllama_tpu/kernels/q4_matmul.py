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


def _dot_precision(w_dtype):
    """f32 weights (parity/test mode) must not be silently downcast by the
    backend's default matmul precision; bf16 runs native MXU passes."""
    return jax.lax.Precision.HIGHEST if jnp.dtype(w_dtype) == jnp.float32 else None


def _pick_tile(dim: int, cap: int = 512, unit: int = 128) -> int:
    """Largest divisor of dim that is a multiple of `unit` and <= cap.
    Falls back to the dim itself (small matrices in tests)."""
    best = 0
    d = unit
    while d <= cap:
        if dim % d == 0:
            best = d
        d += unit
    return best or dim


def _pick_tile_k(k: int, cap: int = 2816) -> int:
    """K tile: multiple of 256 (so K/2 tiles are 128-lane aligned in the
    packed plane) dividing k, as large as possible up to cap."""
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


def _q41mm_kernel(x_lo_ref, x_hi_ref, qs_ref, sc_ref, mn_ref, out_ref, *,
                  w_dtype):
    """Affine (q4_1/GPTQ) variant: w = q*d + m per block."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qs = qs_ref[:].astype(jnp.int32)
    sc = _repeat_scales(sc_ref[:].astype(jnp.float32))
    mn = _repeat_scales(mn_ref[:].astype(jnp.float32))
    w_lo = ((qs & 0x0F).astype(jnp.float32) * sc + mn).astype(w_dtype)
    w_hi = ((qs >> 4).astype(jnp.float32) * sc + mn).astype(w_dtype)

    prec = _dot_precision(w_dtype)
    acc = jnp.dot(x_lo_ref[:].astype(w_dtype), w_lo,
                  preferred_element_type=jnp.float32, precision=prec)
    acc += jnp.dot(x_hi_ref[:].astype(w_dtype), w_hi,
                   preferred_element_type=jnp.float32, precision=prec)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret", "w_dtype"))
def q41_matmul_pallas(x: jax.Array, qs: jax.Array, scales: jax.Array,
                      mins: jax.Array, *, block_n: int = 0, block_k: int = 0,
                      interpret: bool = False,
                      w_dtype=jnp.bfloat16) -> jax.Array:
    """Affine-quantized y = x @ (Q*d + m); f32 output."""
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)
    bn = block_n or _pick_tile(n)
    bk = block_k or _pick_tile_k(k)
    grid = (n // bn, k // bk)
    x_lo, x_hi = split_activation(x)
    kernel = functools.partial(_q41mm_kernel, w_dtype=w_dtype)
    blk_spec = pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            blk_spec,
            blk_spec,
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x_lo, x_hi, qs, scales, mins)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret", "w_dtype"))
def q4_matmul_pallas(x: jax.Array, qs: jax.Array, scales: jax.Array,
                     *, block_n: int = 0, block_k: int = 0,
                     interpret: bool = False, w_dtype=jnp.bfloat16) -> jax.Array:
    """y[M, N] = x[M, K] @ dequant(W[K, N]); f32 output.

    Args:
      x: [M, K] activations (any float dtype; cast to w_dtype for the MXU).
      qs/scales: device layout per QuantMatmulWeight.
    """
    m, k = x.shape
    kh, n = qs.shape
    assert kh * 2 == k, (x.shape, qs.shape)

    bn = block_n or _pick_tile(n)
    bk = block_k or _pick_tile_k(k)
    grid = (n // bn, k // bk)

    x_lo, x_hi = split_activation(x)

    kernel = functools.partial(_q4mm_kernel, w_dtype=w_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bk // 2), lambda i, kk: (0, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // QBLOCK, bn), lambda i, kk: (kk, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, kk: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=kh * n + (k // QBLOCK) * n * 4 + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_lo, x_hi, qs, scales)
    return out


def q4_matmul_xla(x: jax.Array, w: QuantMatmulWeight,
                  w_dtype=jnp.bfloat16) -> jax.Array:
    """Dequant-then-dot; XLA fuses the dequant chain into the matmul.
    x must already be padded to w's stored K; output is padded-N wide."""
    dense = dequant_matmul_weight(w, dtype=w_dtype)
    return jnp.dot(x.astype(w_dtype), dense, preferred_element_type=jnp.float32,
                   precision=_dot_precision(w_dtype))


# Heuristic crossover: below this M the op is HBM-bound and the Pallas kernel
# wins by never materializing dense weights; above it XLA's matmul pipeline
# (which amortizes dequant across M) is at least as good.
_PALLAS_MAX_M = 64


def pallas_shapes_supported(k: int, n: int) -> bool:
    """Mosaic requires the last two block dims to be (8, 128)-divisible or
    equal to the full array dims. Small/unaligned models (tests, exotic
    shards) fall back to the XLA path."""
    bn = _pick_tile(n)
    bk = _pick_tile_k(k)
    kh = k // 2
    bkh = bk // 2
    ok_x = (bkh % 128 == 0) or (bkh == kh)           # x_lo/x_hi last dim
    ok_qs_lane = (bn % 128 == 0) or (bn == n)
    ok_qs_sub = (bkh % 8 == 0) or (bkh == kh)
    nb_blk = bk // QBLOCK
    ok_sc_sub = (nb_blk % 8 == 0) or (nb_blk == k // QBLOCK)
    return ok_x and ok_qs_lane and ok_qs_sub and ok_sc_sub


def q4_matmul(x: jax.Array, w: QuantMatmulWeight, *,
              use_pallas: bool | None = None,
              w_dtype=jnp.bfloat16,
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

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu") and m <= _PALLAS_MAX_M
    if use_pallas and not pallas_shapes_supported(k_stored, w.qs.shape[1]):
        use_pallas = False
    if use_pallas:
        # Pad M up to the f32 sublane tile so tiny decode batches map cleanly.
        m_pad = max(8, -(-m // 8) * 8)
        if m_pad != m:
            x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        if w.mins is None:
            y = q4_matmul_pallas(x2, w.qs, w.scales, interpret=interpret,
                                 w_dtype=w_dtype)[:m]
        else:
            y = q41_matmul_pallas(x2, w.qs, w.scales, w.mins,
                                  interpret=interpret, w_dtype=w_dtype)[:m]
    else:
        y = q4_matmul_xla(x2, w, w_dtype=w_dtype)
    if y.shape[-1] != n_eff:
        y = y[:, :n_eff]
    return y.reshape(*lead, n_eff)
