"""Device-side quantized tensor containers (JAX pytrees).

The TPU device layout differs deliberately from the ggml wire layout
(lib/ggml.c:590-595 packs pairs (2l, 2l+1) into one byte). Here a q4 weight
used as a matmul RHS is stored **K-major** ("transposed", [K, N]) with
**split-K packing**: within each 32-element quantization block along K, the
byte at sublane 16*b + j (j in [0,16)) packs

    low  nibble -> element k = 32*b + j        (the block's first half)
    high nibble -> element k = 32*b + 16 + j   (the block's second half)

This makes in-kernel dequantization interleave-free: ``lo = qs & 0xF`` and
``hi = qs >> 4`` are each a contiguous [K/2, N] half of the weight under a
fixed reindexing of K, so the matmul becomes two MXU passes over x's matching
K-halves — no sublane shuffles, which Mosaic handles poorly.

Scales are a dense f32 plane [K//32, N], tiled into VMEM alongside the codes.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .q4 import QK4_0

QBLOCK = QK4_0  # 32


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantMatmulWeight:
    """A q4_0-quantized matmul RHS of logical shape [K, N] (y = x @ W).

    Attributes:
      qs: uint8 [K_pad//2, N_pad] split-K packed nibbles (value = signed+8).
      scales: f32 [K_pad//32, N_pad] per-block scale d.
      n_logical: true output width (callers receive y[..., :n_logical]).
        Storage may be zero-padded (codes=8, scales=0 -> contributes 0) so
        awkward dims like n_ff=11008 tile onto big, low-overhead Pallas
        blocks; padding is numerically inert.

    The *stored K* may likewise exceed the activation K; q4_matmul zero-pads
    x up to it.
    """
    qs: jax.Array
    scales: jax.Array
    mins: jax.Array | None = None    # affine (q4_1/GPTQ) offset plane m:
                                     # w = q*d + m; None => symmetric q4_0
                                     # w = (q-8)*d
    n_logical: int = 0

    def __post_init__(self):
        if not self.n_logical and hasattr(self.qs, "shape"):
            # default: no padding (guard: leaves may be non-array placeholders
            # during tree transformations)
            self.n_logical = self.qs.shape[1]

    @property
    def k(self) -> int:
        return self.qs.shape[0] * 2

    @property
    def n(self) -> int:
        return self.n_logical

    @property
    def n_padded(self) -> int:
        return self.qs.shape[1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.k, self.n_logical)

    def tree_flatten(self):
        return (self.qs, self.scales, self.mins), (self.n_logical,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_logical=aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantEmbedding:
    """A q4_0-quantized row-gather table of logical shape [V, D].

    Row-major layout (rows are gathered whole): within each 32-block along D,
    split-K packing as above but along the last axis.

      qs: uint8 [V, D//2], scales: f32 [V, D//32]
    """
    qs: jax.Array
    scales: jax.Array

    @property
    def shape(self) -> tuple[int, int]:
        return (self.qs.shape[0], self.qs.shape[1] * 2)

    def tree_flatten(self):
        return (self.qs, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


# ---------------------------------------------------------------------------
# Host-side packing converters (numpy)
# ---------------------------------------------------------------------------

def split_pack_lastdim(codes: np.ndarray) -> np.ndarray:
    """[..., K] uint8 codes -> [..., K//2] split-K packed bytes (numpy)."""
    codes = np.asarray(codes, np.uint8)
    k = codes.shape[-1]
    lead = codes.shape[:-1]
    blocks = codes.reshape(*lead, k // QBLOCK, QBLOCK)
    lo = blocks[..., : QBLOCK // 2]
    hi = blocks[..., QBLOCK // 2:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed.reshape(*lead, k // 2)


def split_unpack_lastdim(packed: np.ndarray) -> np.ndarray:
    """Inverse of split_pack_lastdim (numpy)."""
    packed = np.asarray(packed, np.uint8)
    kh = packed.shape[-1]
    lead = packed.shape[:-1]
    blocks = packed.reshape(*lead, kh // (QBLOCK // 2), QBLOCK // 2)
    out = np.concatenate([blocks & 0x0F, blocks >> 4], axis=-1)
    return out.reshape(*lead, kh * 2)


def pad_multiple(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_tile_k(k: int, cap: int = 2816) -> int:
    """The K tile the Pallas kernel will choose for stored dim k: the largest
    multiple of 256 dividing k, up to cap (kernels/q4_matmul._pick_tile_k
    mirrors this). Falls back to k itself when no 256-multiple divides it
    (then the whole K is one tile — also fine)."""
    best = 0
    d = 256
    while d <= cap:
        if k % d == 0:
            best = d
        d += 256
    return best or k


def good_pad_k(k: int) -> int:
    """Smallest stored K >= k (multiple of 256) whose Pallas K tile is large.

    Some model dims have no large 256-multiple divisor — 7B's n_ff=11008
    only offers bk=256, which ran the w2 matmul at ~257 GB/s vs ~1000 with
    bk=2816 on v5e (43 sequential micro-steps starve the DMA pipeline). A few
    inert padded rows (codes->0, scales=0) buy the good tiling: 11008->11264
    (+2.3% bytes), 22016->22528, 6656->6912. Reduction-sharded weights must
    NOT keep this padding (interior shard boundaries would shift);
    parallel/sharding.shard_params strips it."""
    k0 = pad_multiple(k, 256)
    cand = k0
    while cand <= k0 + 2816:
        # good = the whole K is one tile, or the tile is large
        if pick_tile_k(cand) >= min(1024, cand):
            return cand
        cand += 256
    return k0


def good_pad_n(n: int) -> int:
    """Smallest stored N >= n (multiple of 256) whose Pallas N tile is the
    full 1024 lanes, capped at +3% inert columns.

    Awkward N dims settle for narrow tiles otherwise — 7B's fused w13
    (N=22016) only divides by 512 (553 GB/s measured) and the 32000-vocab
    head only by 256 (544 GB/s), vs 587 GB/s at bn=1024. Padding to
    22528 / 32768 (+2.3% bytes each) nets ~120 us/step at 7B decode.
    Sharded weights shed this padding (shard_params strips to n_logical:
    shards need exact local widths)."""
    n0 = pad_multiple(n, 256)
    cand = n0
    while cand <= n0 + int(n0 * 0.03):
        if cand % 1024 == 0:
            return cand
        cand += 256
    return n0


def pack_codes_split_k(codes_t: np.ndarray) -> np.ndarray:
    """[K, N] uint8 codes -> [K/2, N] split-K packed bytes."""
    k, n = codes_t.shape
    blocks = codes_t.reshape(k // QBLOCK, QBLOCK, n)
    packed = (blocks[:, : QBLOCK // 2, :] | (blocks[:, QBLOCK // 2:, :] << 4))
    return packed.reshape(k // 2, n).astype(np.uint8)


def make_matmul_weight(codes: np.ndarray, scales: np.ndarray,
                       scale_dtype: Any = np.float32,
                       pad_k: int = 0, pad_n: int = 0) -> QuantMatmulWeight:
    """Build the device layout from row-major quantizer output.

    Args:
      codes: uint8 [N, K] (as produced by quant.q4.quantize_q4_0 on a weight
        whose ggml orientation is [N rows, K cols], i.e. y = W @ x^T rows).
      scales: f32 [N, K//32].
      pad_k/pad_n: round the stored dims up with inert padding (codes=8,
        scales=0) so awkward dims (e.g. n_ff=11008) map to large aligned
        Pallas tiles. pad_k=0 (default) = auto: good_pad_k picks the smallest
        K with a large tile divisor. The logical N is preserved in the
        container; q4_matmul slices outputs and zero-pads activations.
    """
    n, k = codes.shape
    k_pad = good_pad_k(k) if not pad_k else pad_multiple(k, pad_k)
    n_pad = good_pad_n(n) if not pad_n else pad_multiple(n, pad_n)
    codes_t = np.full((k_pad, n_pad), 8, np.uint8)
    codes_t[:k, :n] = np.asarray(codes, np.uint8).T
    scales_t = np.zeros((k_pad // QBLOCK, n_pad), np.float32)
    scales_t[: k // QBLOCK, :n] = np.asarray(scales, np.float32).T
    packed = pack_codes_split_k(codes_t)
    return QuantMatmulWeight(qs=jnp.asarray(packed),
                             scales=jnp.asarray(scales_t.astype(scale_dtype)),
                             n_logical=n)


def matmul_weight_from_planes(qs: np.ndarray, scales: np.ndarray,
                              pad_k: int = 0, pad_n: int = 0
                              ) -> QuantMatmulWeight:
    """Build from unpadded device-layout planes (qs [K/2, N], scales
    [K/32, N]), applying inert tile padding (pad_k=0 = auto, good_pad_k)."""
    kh, n = qs.shape
    k = kh * 2
    k_pad = good_pad_k(k) if not pad_k else pad_multiple(k, pad_k)
    n_pad = good_pad_n(n) if not pad_n else pad_multiple(n, pad_n)
    if (k_pad, n_pad) != (k, n):
        out_qs = np.full((k_pad // 2, n_pad), 0x88, np.uint8)
        out_qs[:kh, :n] = qs
        out_sc = np.zeros((k_pad // QBLOCK, n_pad), np.float32)
        out_sc[: k // QBLOCK, :n] = scales
        qs, scales = out_qs, out_sc
    return QuantMatmulWeight(qs=jnp.asarray(qs), scales=jnp.asarray(scales),
                             n_logical=n)


def make_embedding(codes: np.ndarray, scales: np.ndarray) -> QuantEmbedding:
    """Build the row-major gather layout. codes uint8 [V, D], scales [V, D//32]."""
    packed = split_pack_lastdim(codes)
    return QuantEmbedding(qs=jnp.asarray(packed),
                          scales=jnp.asarray(np.asarray(scales, np.float32)))


def matmul_weight_to_codes(w: QuantMatmulWeight,
                           k_logical: int | None = None
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Device layout -> row-major (codes [N, K], scales [N, K//32]) numpy.
    Padding is stripped (N via n_logical; K via k_logical if given)."""
    packed = np.asarray(w.qs)                      # [K_pad/2, N_pad]
    kh, n_pad = packed.shape
    blocks = packed.reshape(kh // (QBLOCK // 2), QBLOCK // 2, n_pad)
    codes_t = np.concatenate([blocks & 0x0F, blocks >> 4], axis=1).reshape(kh * 2, n_pad)
    scales_t = np.asarray(w.scales, np.float32)
    k = k_logical or kh * 2
    codes = np.ascontiguousarray(codes_t[:k, :w.n_logical].T)
    scales = np.ascontiguousarray(scales_t[: k // QBLOCK, :w.n_logical].T)
    return codes, scales


# ---------------------------------------------------------------------------
# jnp dequantization (jit-safe; the XLA-fused fallback path)
# ---------------------------------------------------------------------------

def dequant_matmul_weight(w: QuantMatmulWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the dense [K, N] weight. Used by the XLA fallback matmul
    (XLA fuses this chain into the dot when profitable) and by tests.

    q4_0: w = (q - 8) * d;   q4_1/GPTQ (mins present): w = q * d + m."""
    qs = w.qs
    kh, n = qs.shape
    nb = kh // (QBLOCK // 2)
    blocks = qs.reshape(nb, QBLOCK // 2, n)
    lo = (blocks & 0x0F).astype(jnp.int8)
    hi = (blocks >> 4).astype(jnp.int8)
    codes = jnp.concatenate([lo, hi], axis=1)              # [nb, 32, N]
    scale = w.scales.reshape(nb, 1, n).astype(jnp.float32)
    if w.mins is None:
        dense = (codes.astype(jnp.float32) - 8.0) * scale
    else:
        m = w.mins.reshape(nb, 1, n).astype(jnp.float32)
        dense = codes.astype(jnp.float32) * scale + m
    return dense.reshape(nb * QBLOCK, n).astype(dtype)


def make_matmul_weight_q41(codes: np.ndarray, scales: np.ndarray,
                           mins: np.ndarray,
                           pad_k: int = 0, pad_n: int = 256
                           ) -> QuantMatmulWeight:
    """Affine-quantized RHS (q4_1 / GPTQ): w = q*d + m per 32-block.

    codes uint8 [N, K], scales/mins f32 [N, K//32] (padding is inert:
    codes=0, d=0, m=0; pad_k=0 = auto, good_pad_k)."""
    n, k = codes.shape
    k_pad = good_pad_k(k) if not pad_k else pad_multiple(k, pad_k)
    n_pad = good_pad_n(n) if not pad_n else pad_multiple(n, pad_n)
    codes_t = np.zeros((k_pad, n_pad), np.uint8)
    codes_t[:k, :n] = np.asarray(codes, np.uint8).T
    scales_t = np.zeros((k_pad // QBLOCK, n_pad), np.float32)
    scales_t[: k // QBLOCK, :n] = np.asarray(scales, np.float32).T
    mins_t = np.zeros((k_pad // QBLOCK, n_pad), np.float32)
    mins_t[: k // QBLOCK, :n] = np.asarray(mins, np.float32).T
    packed = pack_codes_split_k(codes_t)
    return QuantMatmulWeight(qs=jnp.asarray(packed),
                             scales=jnp.asarray(scales_t),
                             mins=jnp.asarray(mins_t),
                             n_logical=n)


def dequant_embedding_rows(table: QuantEmbedding, ids: jax.Array,
                           dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize rows: ids [...,] -> [..., D].

    Replaces ggml's get_rows on quantized tensors (lib/ggml.c:8333 area).
    """
    packed = jnp.take(table.qs, ids, axis=0)               # [..., D/2]
    scales = jnp.take(table.scales, ids, axis=0)           # [..., D/32]
    lead = packed.shape[:-1]
    dh = packed.shape[-1]
    nb = dh // (QBLOCK // 2)
    blocks = packed.reshape(*lead, nb, QBLOCK // 2)
    lo = (blocks & 0x0F).astype(jnp.int8) - 8
    hi = (blocks >> 4).astype(jnp.int8) - 8
    codes = jnp.concatenate([lo, hi], axis=-1)             # [..., nb, 32]
    dense = codes.astype(jnp.float32) * scales[..., None].astype(jnp.float32)
    return dense.reshape(*lead, nb * QBLOCK).astype(dtype)
