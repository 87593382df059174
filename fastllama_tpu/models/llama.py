"""LLaMA-family forward pass, TPU-native.

Replaces the reference's Model::eval graph build (/root/reference/lib/
llama.cpp:272-499), which rebuilds a ggml graph per call over a CPU thread
pool. Here the forward pass is a pure function over a params pytree, traced
once per (batch, length) bucket and compiled by XLA; weights are
QuantMatmulWeight (fused Pallas dequant-matmul) or dense arrays.

Numerical parity contract with the reference eval:
  * rms_norm eps = 1e-6                       (lib/ggml.c:7406)
  * interleaved RoPE, theta = 10000^(-2i/n_rot)  (lib/ggml.c:8655-8660)
  * silu-gated FFN: w2( silu(w1 x) * (w3 x) )    (lib/llama.cpp:410-438)
  * causal mask via position comparison replaces diag_mask_inf
    (lib/llama.cpp:346-403); softmax in f32.

The KV cache is a [n_layer, batch, n_ctx, n_head, head_dim] pair written with
dynamic_update_slice at n_past — the static-shape mirror of ggml's
layer-strided view copies (lib/llama.cpp:336-343).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Union

import jax
import jax.numpy as jnp

from ..config import HyperParams
from ..kernels.q4_matmul import q4_matmul
from ..kernels.rope import rope_interleaved
from ..quant.tensor import (
    QuantEmbedding, QuantMatmulWeight, dequant_embedding_rows,
)

Linear = Union[QuantMatmulWeight, jax.Array]   # dense weights are [K, N]
Embedding = Union[QuantEmbedding, jax.Array]   # dense tables are [V, D]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraAdapted:
    """A Linear with a runtime LoRA term: y = x @ base + lora(x).

    TPU-native replacement for the reference's in-place W += ΔW rewrite
    (lib/llama.cpp:873-882), which degrades quantized weights (it even warns,
    llama.cpp:840-846). Keeping ΔW as a separate additive term is lossless on
    q4_0 bases, quantization-aware, and makes attach/detach O(1) — detach
    just unwraps (vs. the reference re-reading the adapter to subtract).

      delta: [K, N] cached ΔW = (B·A·scale)^T       (ggla cached mode)
      a/b:   [K, r] and [r, N] low-rank factors      (ggla no-cache mode;
             a already carries the alpha/r scale, as in the ggla file)
    """
    base: "Linear"
    delta: jax.Array | None = None
    a: jax.Array | None = None
    b: jax.Array | None = None

    def tree_flatten(self):
        return (self.base, self.delta, self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LayerParams:
    attention_norm: jax.Array      # [n_embd] f32
    wq: Linear                     # [n_embd, n_embd]
    wk: Linear
    wv: Linear
    wo: Linear
    ffn_norm: jax.Array            # [n_embd] f32
    w1: Linear                     # [n_embd, n_ff]
    w2: Linear                     # [n_ff, n_embd]
    w3: Linear                     # [n_embd, n_ff]

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LlamaParams:
    tok_embeddings: Embedding      # [n_vocab, n_embd]
    norm: jax.Array                # [n_embd] f32
    output: Linear                 # [n_embd, n_vocab]
    layers: list[LayerParams]

    def tree_flatten(self):
        return (self.tok_embeddings, self.norm, self.output, self.layers), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class ForwardConfig:
    """Static (hashable) trace-time configuration."""
    n_head: int
    n_rot: int
    rms_eps: float = 1e-6
    w_dtype: str = "bfloat16"       # MXU input dtype for dequantized weights
    act_dtype: str = "float32"      # residual-stream dtype
    use_pallas: Any = None          # None = auto by backend/M
    all_logits: bool = False        # reference should_put_all_logits

    @property
    def w_jdtype(self):
        return jnp.dtype(self.w_dtype)

    @property
    def act_jdtype(self):
        return jnp.dtype(self.act_dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(ms + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def apply_linear(x: jax.Array, w: Linear, cfg: ForwardConfig) -> jax.Array:
    """y = x @ W for quantized, dense, or LoRA-adapted weights; f32 result."""
    if isinstance(w, LoraAdapted):
        y = apply_linear(x, w.base, cfg)
        lora_dtype = (w.delta if w.delta is not None else w.a).dtype
        prec = (jax.lax.Precision.HIGHEST
                if lora_dtype == jnp.float32 else None)
        if w.delta is not None:
            y = y + jnp.dot(x.astype(lora_dtype), w.delta,
                            preferred_element_type=jnp.float32, precision=prec)
        else:
            xa = jnp.dot(x.astype(lora_dtype), w.a,
                         preferred_element_type=jnp.float32, precision=prec)
            y = y + jnp.dot(xa.astype(w.b.dtype), w.b,
                            preferred_element_type=jnp.float32, precision=prec)
        return y
    if isinstance(w, QuantMatmulWeight):
        return q4_matmul(x, w, use_pallas=cfg.use_pallas, w_dtype=cfg.w_jdtype)
    precision = (jax.lax.Precision.HIGHEST
                 if w.dtype == jnp.float32 else None)
    return jnp.dot(x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32, precision=precision)


def embed_tokens(table: Embedding, tokens: jax.Array, dtype) -> jax.Array:
    if isinstance(table, QuantEmbedding):
        n_vocab = table.qs.shape[0]
    else:
        n_vocab = table.shape[0]
    # Clamp instead of jnp's NaN-fill gather: padded/garbage slots in bucketed
    # batches must not poison the whole forward pass.
    tokens = jnp.clip(tokens, 0, n_vocab - 1)
    if isinstance(table, QuantEmbedding):
        return dequant_embedding_rows(table, tokens, dtype=dtype)
    return jnp.take(table, tokens, axis=0).astype(dtype)


def _attention(x: jax.Array, layer: LayerParams, layer_idx: int,
               positions: jax.Array, kv_k: jax.Array, kv_v: jax.Array,
               cfg: ForwardConfig):
    """Self-attention for one layer.

    x: [B, T, D]; positions: [B, T] absolute; kv_k/kv_v: [L, B, S, H, Dh].
    Returns (attn_out [B, T, D], new kv_k, new kv_v).
    """
    b, t, d = x.shape
    h = cfg.n_head
    hd = d // h
    s = kv_k.shape[2]

    q = apply_linear(x, layer.wq, cfg).reshape(b, t, h, hd)
    k = apply_linear(x, layer.wk, cfg).reshape(b, t, h, hd)
    v = apply_linear(x, layer.wv, cfg).reshape(b, t, h, hd)

    q = rope_interleaved(q, positions, cfg.n_rot)
    k = rope_interleaved(k, positions, cfg.n_rot)

    kv_dtype = kv_k.dtype
    # Scatter this block's K/V to its absolute positions (the static-shape
    # mirror of ggml's strided view copy, lib/llama.cpp:336-343). Per-row
    # positions support both the single-stream path and the continuous-
    # batching engine (each slot at its own offset); mode='drop' discards
    # writes past n_ctx (padded bucket tails at the context boundary).
    b_idx = jnp.arange(b)[:, None]
    kv_k = kv_k.at[layer_idx, b_idx, positions].set(
        k.astype(kv_dtype), mode="drop")
    kv_v = kv_v.at[layer_idx, b_idx, positions].set(
        v.astype(kv_dtype), mode="drop")

    keys = kv_k[layer_idx].astype(jnp.float32)      # [B, S, H, Dh]
    vals = kv_v[layer_idx].astype(jnp.float32)

    # In parity mode (f32 weights) the attention contractions must also run
    # at full f32; production bf16 runs use the backend default (bf16 MXU).
    attn_prec = (jax.lax.Precision.HIGHEST
                 if cfg.w_jdtype == jnp.float32 else None)
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), keys,
                        precision=attn_prec) * scale

    # causal mask: key position s attends iff s <= query position
    s_idx = jnp.arange(s)[None, None, None, :]            # [1,1,1,S]
    q_pos = positions[:, None, :, None]                   # [B,1,T,1]
    mask = s_idx <= q_pos
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)

    ctx = jnp.einsum("bhts,bshd->bthd", probs, vals, precision=attn_prec)
    ctx = ctx.reshape(b, t, d).astype(cfg.act_jdtype)
    out = apply_linear(ctx, layer.wo, cfg)
    return out.astype(cfg.act_jdtype), kv_k, kv_v


def _ffn(x: jax.Array, layer: LayerParams, cfg: ForwardConfig) -> jax.Array:
    gate = apply_linear(x, layer.w1, cfg)
    up = apply_linear(x, layer.w3, cfg)
    act = jax.nn.silu(gate) * up
    return apply_linear(act.astype(cfg.act_jdtype), layer.w2, cfg).astype(cfg.act_jdtype)


def forward(params: LlamaParams, tokens: jax.Array, n_past: jax.Array,
            kv_k: jax.Array, kv_v: jax.Array, cfg: ForwardConfig,
            last_idx: jax.Array | None = None):
    """The transformer forward pass.

    Args:
      tokens: [B, T] int32 (T static; padded tokens allowed — their logits
        and cache slots are garbage that later writes overwrite).
      n_past: scalar int32 — number of tokens already in the cache.
      kv_k/kv_v: [L, B, S, H, Dh].
      last_idx: scalar int32 — index of the last *valid* token within the
        (possibly padded) T window; defaults to T-1. The non-all-logits
        output head and the embeddings tap read this row.
    Returns:
      (logits, kv_k, kv_v, embeddings):
        logits [B, T, n_vocab] f32 if cfg.all_logits else [B, 1, n_vocab]
        embeddings [B, D] f32 — final pre-output hidden of the last valid
        token (the reference's embeddings tap, lib/llama.cpp:455-460).
    """
    b, t = tokens.shape
    act_dtype = cfg.act_jdtype
    if last_idx is None:
        last_idx = jnp.int32(t - 1)

    positions = n_past + jnp.arange(t, dtype=jnp.int32)
    positions = jnp.broadcast_to(positions[None, :], (b, t))

    x = embed_tokens(params.tok_embeddings, tokens, act_dtype)

    for li, layer in enumerate(params.layers):
        attn_in = rms_norm(x, layer.attention_norm, cfg.rms_eps)
        attn_out, kv_k, kv_v = _attention(
            attn_in, layer, li, positions, kv_k, kv_v, cfg)
        x = x + attn_out
        ffn_in = rms_norm(x, layer.ffn_norm, cfg.rms_eps)
        x = x + _ffn(ffn_in, layer, cfg)

    x = rms_norm(x, params.norm, cfg.rms_eps)
    x_last = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)  # [B,1,D]
    embeddings = x_last[:, 0, :].astype(jnp.float32)

    if cfg.all_logits:
        logits = apply_linear(x, params.output, cfg)
    else:
        logits = apply_linear(x_last, params.output, cfg)
    return logits.astype(jnp.float32), kv_k, kv_v, embeddings


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_k", "kv_v"))
def forward_jit(params, tokens, n_past, kv_k, kv_v, cfg: ForwardConfig,
                last_idx=None):
    return forward(params, tokens, n_past, kv_k, kv_v, cfg, last_idx)


def init_kv_cache(hp: HyperParams, batch: int, n_ctx: int,
                  dtype=jnp.bfloat16) -> tuple[jax.Array, jax.Array]:
    """Allocate the KV cache (reference: KVCacheBuffer::init, llama.cpp:24-51;
    dtype is configurable where the reference hard-codes f32)."""
    shape = (hp.n_layer, batch, n_ctx, hp.n_head, hp.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
