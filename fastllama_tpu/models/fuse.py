"""Weight fusion for decode efficiency.

Decode is HBM-bandwidth-bound and per-kernel-launch-overhead-sensitive: the
QKV projections share their input, as do w1/w3, so they are fused into single
matmul weights at load time (7 -> 4 kernel launches per layer).

Column orders are chosen so tensor-parallel column sharding stays correct:

  wqkv [D, H*3*hd]: per head h, columns [q_h | k_h | v_h] — a tp shard gets
    whole heads, and the post-matmul reshape [..., h, 3, hd] splits locally.
  w13 [D, 2F]: column pairs (w1_f, w3_f) — any contiguous column shard holds
    matching gate/up pairs; reshape [..., F, 2] splits locally.

Fusion operates directly on the packed device-layout planes: split-K packing
is along K only, so fusing along N is pure column reordering — no unpacking.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..quant.tensor import (
    QBLOCK, QuantMatmulWeight, good_pad_k, pack_codes_split_k, pad_multiple,
)


def qkv_col_order(n_head: int, hd: int) -> np.ndarray:
    """Column permutation: [q|k|v] blocks -> per-head [q_h|k_h|v_h]."""
    d = n_head * hd
    order = np.empty(3 * d, np.int64)
    pos = 0
    for h in range(n_head):
        for part in range(3):
            start = part * d + h * hd
            order[pos:pos + hd] = np.arange(start, start + hd)
            pos += hd
    return order


def w13_col_order(n_ff: int) -> np.ndarray:
    """Column permutation: [w1|w3] blocks -> pairs (w1_f, w3_f)."""
    order = np.empty(2 * n_ff, np.int64)
    order[0::2] = np.arange(n_ff)
    order[1::2] = np.arange(n_ff) + n_ff
    return order


def _pad_packed(qs: np.ndarray, scales: np.ndarray, k_logical: int,
                pad_n: int = 256, pad_code: int = 0x88):
    """Pad packed planes to tile-friendly dims with inert values (K via
    good_pad_k auto-padding). pad_code 0x88 (code 8 = value 0) for symmetric
    q4_0; 0x00 for affine weights whose padding is made inert by zero scales
    *and* zero mins."""
    kh, n = qs.shape
    k_pad = good_pad_k(k_logical)
    n_pad = pad_multiple(n, pad_n)
    if (k_pad // 2, n_pad) == (kh, n):
        return qs, scales
    out_qs = np.full((k_pad // 2, n_pad), pad_code, np.uint8)
    out_qs[:kh, :n] = qs
    out_sc = np.zeros((k_pad // QBLOCK, n_pad), scales.dtype)
    out_sc[: scales.shape[0], :n] = scales
    return out_qs, out_sc


def _pad_packed_plane(plane: np.ndarray, k_logical: int,
                      pad_n: int = 256):
    """Zero-pad a [K/32, N] plane to the padded dims."""
    nb, n = plane.shape
    k_pad = good_pad_k(k_logical)
    n_pad = pad_multiple(n, pad_n)
    if (k_pad // QBLOCK, n_pad) == (nb, n):
        return plane, None
    out = np.zeros((k_pad // QBLOCK, n_pad), plane.dtype)
    out[:nb, :n] = plane
    return out, None


def fuse_packed(parts: list[tuple],
                order: np.ndarray) -> QuantMatmulWeight:
    """Fuse device-layout planes along N with a column permutation, then pad.
    Parts are (qs [K/2,N_i], scales [K/32,N_i]) or, for affine (q4_1/GPTQ)
    weights, (qs, scales, mins)."""
    affine = len(parts[0]) == 3
    qs = np.concatenate([p[0] for p in parts], axis=1)[:, order]
    sc = np.concatenate([p[1] for p in parts], axis=1)[:, order]
    n_logical = qs.shape[1]
    k_logical = qs.shape[0] * 2
    mn = None
    if affine:
        mn = np.concatenate([p[2] for p in parts], axis=1)[:, order]
        mn, _ = _pad_packed_plane(mn, k_logical)
    qs, sc = _pad_packed(np.ascontiguousarray(qs), np.ascontiguousarray(sc),
                         k_logical, pad_code=0x00 if affine else 0x88)
    return QuantMatmulWeight(qs=jnp.asarray(qs), scales=jnp.asarray(sc),
                             mins=None if mn is None else jnp.asarray(mn),
                             n_logical=n_logical)


def fuse_dense(parts: list[np.ndarray], order: np.ndarray) -> jnp.ndarray:
    """Fuse dense [K, N_i] matmul weights along N (no padding needed: the
    XLA dot path has no tile constraints)."""
    return jnp.asarray(np.concatenate(parts, axis=1)[:, order])


def packed_planes(codes: np.ndarray, scales: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Quantizer output (codes [N, K], scales [N, K/32]) -> unpadded device
    planes (qs [K/2, N], scales [K/32, N])."""
    codes_t = np.ascontiguousarray(np.asarray(codes, np.uint8).T)
    return (pack_codes_split_k(codes_t),
            np.ascontiguousarray(np.asarray(scales, np.float32).T))


def make_layer_params(n_head: int, *, attention_norm, ffn_norm,
                      wq, wk, wv, wo, w1, w2, w3):
    """Build a fused LayerParams from per-tensor specs.

    Each weight spec is one of
      ("q4", codes [N, K], scales [N, K/32])   — ggml row-major orientation
      ("q41", codes, scales, mins)             — affine (q4_1/GPTQ), row-major
      ("q4p", qs [K/2, N], scales [K/32, N])   — unpadded device planes
                                                 (the native repack path)
      ("dense", w [K, N])                      — already model-transposed
    QKV must share a kind, as must w1/w3.
    """
    import jax.numpy as jnp
    from ..quant.tensor import (
        make_matmul_weight, make_matmul_weight_q41, matmul_weight_from_planes,
    )
    from .llama import LayerParams

    def single(spec):
        if spec[0] == "q4":
            return make_matmul_weight(spec[1], spec[2])
        if spec[0] == "q41":
            return make_matmul_weight_q41(spec[1], spec[2], spec[3])
        if spec[0] == "q4p":
            return matmul_weight_from_planes(spec[1], spec[2])
        return jnp.asarray(spec[1])

    def fuse(specs, order):
        kinds = {s[0] for s in specs}
        if kinds == {"q4"}:
            return fuse_packed([packed_planes(s[1], s[2]) for s in specs],
                               order)
        if kinds == {"q41"}:
            return fuse_packed(
                [packed_planes(s[1], s[2]) + (
                    np.ascontiguousarray(np.asarray(s[3], np.float32).T),)
                 for s in specs], order)
        if kinds == {"q4p"}:
            return fuse_packed([(s[1], s[2]) for s in specs], order)
        if kinds == {"dense"}:
            return fuse_dense([np.asarray(s[1]) for s in specs], order)
        raise ValueError(f"cannot fuse mixed weight kinds {kinds}")

    def out_dim(spec):
        if spec[0] in ("q4", "q41"):
            return spec[1].shape[0]
        return spec[1].shape[1]

    hd = out_dim(wq) // n_head
    n_ff = out_dim(w1)

    return LayerParams(
        attention_norm=jnp.asarray(attention_norm),
        wqkv=fuse([wq, wk, wv], qkv_col_order(n_head, hd)),
        wo=single(wo),
        ffn_norm=jnp.asarray(ffn_norm),
        w13=fuse([w1, w3], w13_col_order(n_ff)),
        w2=single(w2),
    )


def split_qkv(y, n_head: int):
    """[B, T, 3*h*hd] fused output -> (q, k, v) each [B, T, h, hd]."""
    b, t, n3 = y.shape
    hd = n3 // (3 * n_head)
    y = y.reshape(b, t, n_head, 3, hd)
    return y[..., 0, :], y[..., 1, :], y[..., 2, :]


def split_w13(y):
    """[B, T, 2F] fused output -> (gate, up) each [B, T, F]."""
    b, t, f2 = y.shape
    y = y.reshape(b, t, f2 // 2, 2)
    return y[..., 0], y[..., 1]
