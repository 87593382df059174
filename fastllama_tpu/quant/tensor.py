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
      qs: uint8 [K//2, N] split-K packed nibbles (stored value = signed+8).
      scales: f32 [K//32, N] per-block scale d.
    """
    qs: jax.Array
    scales: jax.Array

    @property
    def k(self) -> int:
        return self.qs.shape[0] * 2

    @property
    def n(self) -> int:
        return self.qs.shape[1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.k, self.n)

    def tree_flatten(self):
        return (self.qs, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


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


def make_matmul_weight(codes: np.ndarray, scales: np.ndarray,
                       scale_dtype: Any = np.float32) -> QuantMatmulWeight:
    """Build the device layout from row-major quantizer output.

    Args:
      codes: uint8 [N, K] (as produced by quant.q4.quantize_q4_0 on a weight
        whose ggml orientation is [N rows, K cols], i.e. y = W @ x^T rows).
      scales: f32 [N, K//32].
    """
    n, k = codes.shape
    codes_t = np.ascontiguousarray(np.asarray(codes, np.uint8).T)       # [K, N]
    scales_t = np.ascontiguousarray(np.asarray(scales, np.float32).T)   # [K//32, N]
    blocks = codes_t.reshape(k // QBLOCK, QBLOCK, n)
    packed = (blocks[:, : QBLOCK // 2, :] | (blocks[:, QBLOCK // 2:, :] << 4))
    packed = packed.reshape(k // 2, n).astype(np.uint8)
    return QuantMatmulWeight(qs=jnp.asarray(packed),
                             scales=jnp.asarray(scales_t.astype(scale_dtype)))


def make_embedding(codes: np.ndarray, scales: np.ndarray) -> QuantEmbedding:
    """Build the row-major gather layout. codes uint8 [V, D], scales [V, D//32]."""
    packed = split_pack_lastdim(codes)
    return QuantEmbedding(qs=jnp.asarray(packed),
                          scales=jnp.asarray(np.asarray(scales, np.float32)))


def matmul_weight_to_codes(w: QuantMatmulWeight) -> tuple[np.ndarray, np.ndarray]:
    """Device layout -> row-major (codes [N, K], scales [N, K//32]) numpy."""
    packed = np.asarray(w.qs)                      # [K/2, N]
    kh, n = packed.shape
    blocks = packed.reshape(kh // (QBLOCK // 2), QBLOCK // 2, n)
    codes_t = np.concatenate([blocks & 0x0F, blocks >> 4], axis=1).reshape(kh * 2, n)
    scales_t = np.asarray(w.scales, np.float32)
    return np.ascontiguousarray(codes_t.T), np.ascontiguousarray(scales_t.T)


# ---------------------------------------------------------------------------
# jnp dequantization (jit-safe; the XLA-fused fallback path)
# ---------------------------------------------------------------------------

def dequant_matmul_weight(w: QuantMatmulWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the dense [K, N] weight. Used by the XLA fallback matmul
    (XLA fuses this chain into the dot when profitable) and by tests."""
    qs = w.qs
    kh, n = qs.shape
    nb = kh // (QBLOCK // 2)
    blocks = qs.reshape(nb, QBLOCK // 2, n)
    lo = (blocks & 0x0F).astype(jnp.int8) - 8
    hi = (blocks >> 4).astype(jnp.int8) - 8
    codes = jnp.concatenate([lo, hi], axis=1)              # [nb, 32, N]
    scale = w.scales.reshape(nb, 1, n).astype(jnp.float32)
    dense = codes.astype(jnp.float32) * scale
    return dense.reshape(nb * QBLOCK, n).astype(dtype)


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
