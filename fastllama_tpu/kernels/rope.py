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


def rope_tables(n_ctx: int, n_rot: int) -> tuple[jax.Array, jax.Array]:
    """Precomputed cos/sin tables [n_ctx, n_rot//2] for decode hot loops."""
    half = n_rot // 2
    freqs = jnp.float32(10000.0) ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / n_rot)
    pos = jnp.arange(n_ctx, dtype=jnp.float32)[:, None]
    theta = pos * freqs
    return jnp.cos(theta), jnp.sin(theta)
