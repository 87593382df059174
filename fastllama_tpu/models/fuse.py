"""Weight fusion for decode efficiency.

Decode is HBM-bandwidth-bound and per-kernel-launch-overhead-sensitive: the
QKV projections share their input, as do w1/w3, so they are fused into single
matmul weights at load time (7 -> 4 kernel launches per layer).

Column order is PLAIN BLOCK CONCATENATION: wqkv = [Q | K | V], w13 =
[w1 | w3]. The splits after the fused matmul are then contiguous lane
slices, which XLA lowers to (near-)free views. (The first design
interleaved columns — per-head [q_h|k_h|v_h], (w1_f, w3_f) pairs — so that
*contiguous* tensor-parallel shards stayed correct; profiling showed the
w13 de-interleave reshape [..., F, 2] put a size-2 axis in the lane
dimension and cost ~12 us of relayout per layer per decode step. Block
order moves the tp complexity to load time instead: parallel/sharding.py
repermutes the fused columns into per-shard blocks [Q_s|K_s|V_s] /
[w1_s|w3_s] before device_put, so each shard_map shard still splits
locally with the same slice code.)

Fusion operates directly on the packed device-layout planes: split-K packing
is along K only, so fusing along N is pure column reordering — no unpacking.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..quant.tensor import (
    QBLOCK, QuantMatmulWeight, good_pad_k, good_pad_n, pack_codes_split_k,
    pad_multiple,
)


def qkv_col_order(n_head: int, hd: int) -> np.ndarray:
    """Fused column order: plain [Q | K | V] blocks (identity over the
    concatenation — see module docstring for why not per-head interleave)."""
    return np.arange(3 * n_head * hd, dtype=np.int64)


def w13_col_order(n_ff: int) -> np.ndarray:
    """Fused column order: plain [w1 | w3] blocks."""
    return np.arange(2 * n_ff, dtype=np.int64)


def shard_col_order(n_total: int, n_parts: int, tp: int) -> np.ndarray:
    """Permutation taking the block-fused layout [P0 | P1 | ...] (n_parts
    equal blocks of width n_total/n_parts) to per-shard blocks
    [P0_s0 | P1_s0 | ... | P0_s1 | ...], so that a CONTIGUOUS 1/tp column
    slice (what NamedSharding hands each device) holds every part's s-th
    column range and the shard-local split code stays identical to the
    single-device path."""
    width = n_total // n_parts
    if width % tp:
        raise ValueError(f"part width {width} not divisible by tp={tp}")
    w_loc = width // tp
    order = np.empty(n_total, np.int64)
    pos = 0
    for s in range(tp):
        for part in range(n_parts):
            start = part * width + s * w_loc
            order[pos:pos + w_loc] = np.arange(start, start + w_loc)
            pos += w_loc
    return order


def _pad_packed(qs: np.ndarray, scales: np.ndarray, k_logical: int,
                pad_n: int = 0, pad_code: int = 0x88):
    """Pad packed planes to tile-friendly dims with inert values (K via
    good_pad_k auto-padding). pad_code 0x88 (code 8 = value 0) for symmetric
    q4_0; 0x00 for affine weights whose padding is made inert by zero scales
    *and* zero mins."""
    kh, n = qs.shape
    k_pad = good_pad_k(k_logical)
    n_pad = good_pad_n(n) if not pad_n else pad_multiple(n, pad_n)
    if (k_pad // 2, n_pad) == (kh, n):
        return qs, scales
    out_qs = np.full((k_pad // 2, n_pad), pad_code, np.uint8)
    out_qs[:kh, :n] = qs
    out_sc = np.zeros((k_pad // QBLOCK, n_pad), scales.dtype)
    out_sc[: scales.shape[0], :n] = scales
    return out_qs, out_sc


def _pad_packed_plane(plane: np.ndarray, k_logical: int,
                      pad_n: int = 0):
    """Zero-pad a [K/32, N] plane to the padded dims."""
    nb, n = plane.shape
    k_pad = good_pad_k(k_logical)
    n_pad = good_pad_n(n) if not pad_n else pad_multiple(n, pad_n)
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
    """[B, T, 3*h*hd] fused [Q|K|V] output -> (q, k, v) each [B, T, h, hd].
    Contiguous lane slices (head boundaries are 128-aligned for hd=128)."""
    b, t, n3 = y.shape
    d = n3 // 3
    hd = d // n_head
    q = y[..., :d].reshape(b, t, n_head, hd)
    k = y[..., d:2 * d].reshape(b, t, n_head, hd)
    v = y[..., 2 * d:].reshape(b, t, n_head, hd)
    return q, k, v


def split_w13(y):
    """[B, T, 2F] fused [w1|w3] output -> (gate, up) each [B, T, F].
    A contiguous half-split — the (w1_f, w3_f)-pair layout this replaces
    cost ~12 us/layer/step of lane relayout (size-2 lane axis)."""
    f = y.shape[-1] // 2
    return y[..., :f], y[..., f:]
