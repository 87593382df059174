"""Rotary position embeddings, matching the ggml convention exactly.

The reference applies mode-0 RoPE (ggml_compute_forward_rope_f32,
/root/reference/lib/ggml.c:8609-8700): for position p and dimension pair
(2i, 2i+1) of the first n_rot dims of each head,

    theta_i = p * 10000^(-2i / n_rot)
    (x0, x1) -> (x0*cos - x1*sin, x0*sin + x1*cos)    # adjacent-pair rotate

This is the *interleaved* (GPT-J) convention. HF LLaMA uses rotate-half; the
reference's converter permutes wq/wk at conversion time to compensate
(scripts/convert.py:902-905). Our converter applies the same permutation, so
the engine always runs the interleaved convention below.

TPU note: instead of rotating adjacent lane pairs (a lane-interleave the VPU
dislikes), we apply the mathematically identical de-interleaved form: split x
into even/odd lane halves via a reshape that XLA folds into the surrounding
ops, rotate the halves, and re-interleave. All shapes static under jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_rot",))
def rope_interleaved(x: jax.Array, positions: jax.Array, n_rot: int) -> jax.Array:
    """Apply interleaved RoPE.

    Args:
      x: [..., T, n_head, head_dim] (head_dim >= n_rot; dims past n_rot pass
         through untouched, mirroring ggml's partial-rotation support).
      positions: [T] or [..., T] int32 absolute positions (n_past + t).
      n_rot: number of rotated dims (even).
    Returns:
      same shape/dtype as x.
    """
    orig_dtype = x.dtype
    hd = x.shape[-1]
    rot = x[..., :n_rot].astype(jnp.float32)
    rest = x[..., n_rot:]

    half = n_rot // 2
    freqs = jnp.float32(10000.0) ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / n_rot)
    # positions [..., T] -> theta [..., T, 1, half] broadcast over heads
    theta = positions.astype(jnp.float32)[..., None, None] * freqs
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)

    # de-interleave: even lanes, odd lanes
    pairs = rot.reshape(*rot.shape[:-1], half, 2)
    x0 = pairs[..., 0]
    x1 = pairs[..., 1]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    rot_out = jnp.stack([r0, r1], axis=-1).reshape(*rot.shape)

    out = rot_out.astype(orig_dtype)
    if n_rot < hd:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


def rope_lane_tables_bt(positions: jax.Array, head_dim: int,
                        n_rot: int) -> tuple[jax.Array, jax.Array]:
    """Per-LANE RoPE tables for a [..., T] position grid.

    Returns (cos, sin_signed), each [..., T, 1, head_dim] f32 broadcasting
    over heads: lane l < n_rot carries the pair angle p*10000^(-2(l//2)/
    n_rot), lanes >= n_rot pass through (cos=1, sin=0); sin_signed holds
    the even-lane minus sign. One transcendental chain per forward instead
    of two per layer (the decode kernel's rope_lane_tables, generalized to
    prefill windows)."""
    l = jnp.arange(head_dim, dtype=jnp.int32)
    pair = (l // 2).astype(jnp.float32)
    freq = jnp.float32(10000.0) ** (-2.0 * pair / n_rot)
    theta = positions.astype(jnp.float32)[..., None] * freq
    active = (l < n_rot)
    cos = jnp.where(active, jnp.cos(theta), 1.0)
    sign = jnp.where(l % 2 == 0, -1.0, 1.0)
    sin = jnp.where(active, jnp.sin(theta) * sign, 0.0)
    return cos[..., None, :], sin[..., None, :]


def _pair_swap_matrix(d: int, n_rot: int) -> jax.Array:
    """[d, d] 0/1 P with (x @ P)[l] = x[l^1] for l < n_rot, x[l] above."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    swapped = (rows == (cols ^ 1)).astype(jnp.float32)
    ident = (rows == cols).astype(jnp.float32)
    return jnp.where(cols < n_rot, swapped, ident)


def rope_interleaved_lanes(x: jax.Array, cos_l: jax.Array, sin_s: jax.Array,
                           n_rot: int) -> jax.Array:
    """Interleaved RoPE in NATURAL lane order: x*cos + pairswap(x)*sin_s.

    The pair partner comes from one exact 0/1 matmul over the lane axis
    (MXU, ~free at prefill sizes) instead of a reshape to [..., half, 2] —
    that size-2 lane axis cost ~44 us/layer of relayout at 7B/512
    (profiled round 5). Same math as rope_interleaved: even lane 2i gets
    x0*cos - x1*sin (sign folded into sin_s), odd gets x0*sin + x1*cos."""
    xf = x.astype(jnp.float32)
    p = _pair_swap_matrix(x.shape[-1], n_rot)
    partner = jax.lax.dot_general(
        xf, p, (((xf.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return (xf * cos_l + partner * sin_s).astype(x.dtype)


def rope_tables(n_ctx: int, n_rot: int) -> tuple[jax.Array, jax.Array]:
    """Precomputed cos/sin tables [n_ctx, n_rot//2] for decode hot loops."""
    half = n_rot // 2
    freqs = jnp.float32(10000.0) ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / n_rot)
    pos = jnp.arange(n_ctx, dtype=jnp.float32)[:, None]
    theta = pos * freqs
    return jnp.cos(theta), jnp.sin(theta)
