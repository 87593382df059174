"""LLaMA-family forward pass, TPU-native.

Replaces the reference's Model::eval graph build (/root/reference/lib/
llama.cpp:272-499), which rebuilds a ggml graph per call over a CPU thread
pool. Here the forward pass is a pure function over a params pytree, traced
once per (batch, length) bucket and compiled by XLA; weights are
QuantMatmulWeight (fused Pallas dequant-matmul) or dense arrays.

Decode-path design (bandwidth-bound, profiled on v5e):
  * QKV and w1/w3 are pre-fused into single matmul weights (models/fuse.py)
    — 4 kernel launches per layer instead of 7.
  * The KV cache is a per-layer list of [B, S, H*Dh] buffers (not one
    stacked array): XLA aliases the donated buffers in place, where a
    scatter into a stacked [L, ...] cache cost ~4 ms/step in copies. Heads
    stay flat so the decode-attention kernel blocks them without a copy.
  * LoRA adapters are separate additive terms (LoraTerm fields), never
    folded into the quantized base weights.

Numerical parity contract with the reference eval:
  * rms_norm eps = 1e-6                          (lib/ggml.c:7406)
  * interleaved RoPE, theta = 10000^(-2i/n_rot)  (lib/ggml.c:8655-8660)
  * silu-gated FFN: w2( silu(w1 x) * (w3 x) )    (lib/llama.cpp:410-438)
  * causal mask via position comparison replaces diag_mask_inf
    (lib/llama.cpp:346-403); softmax in f32.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Union

import jax
import jax.numpy as jnp

from ..config import HyperParams
from ..kernels.decode_attention import decode_attention, decode_attn_supported
from ..kernels.q4_matmul import q4_matmul
from ..kernels.rope import (
    rope_interleaved, rope_interleaved_lanes, rope_lane_tables_bt,
)
from ..quant.tensor import (
    QuantEmbedding, QuantMatmulWeight, dequant_embedding_rows,
)
from .fuse import split_qkv, split_w13

Linear = Union[QuantMatmulWeight, jax.Array]   # dense weights are [K, N]
Embedding = Union[QuantEmbedding, jax.Array]   # dense tables are [V, D]

# Per-layer cache pair, each [B, S, H*Dh] — heads FLAT in the last axis so
# the fused decode-attention kernel can block per-head columns without a
# physical layout change (see kernels/decode_attention.py).
KVPair = tuple[jax.Array, jax.Array]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraTerm:
    """A runtime LoRA adapter term: lora(x) = x @ delta  or  (x @ a) @ b.

    TPU-native replacement for the reference's in-place W += ΔW rewrite
    (lib/llama.cpp:873-882), which degrades quantized weights (it even
    warns, llama.cpp:840-846). Keeping ΔW separate is lossless on q4_0
    bases, and detach is O(1) (the reference re-reads the adapter file to
    subtract). `a` carries the alpha/r scale, as in the ggla file format.
    """
    delta: jax.Array | None = None   # [K, N]
    a: jax.Array | None = None       # [K, r]
    b: jax.Array | None = None       # [r, N]

    def tree_flatten(self):
        return (self.delta, self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def apply_lora(x: jax.Array, t: LoraTerm) -> jax.Array:
    dtype = (t.delta if t.delta is not None else t.a).dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    if t.delta is not None:
        return jnp.dot(x.astype(dtype), t.delta,
                       preferred_element_type=jnp.float32, precision=prec)
    xa = jnp.dot(x.astype(dtype), t.a,
                 preferred_element_type=jnp.float32, precision=prec)
    return jnp.dot(xa.astype(t.b.dtype), t.b,
                   preferred_element_type=jnp.float32, precision=prec)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LayerParams:
    attention_norm: jax.Array          # [n_embd] f32
    wqkv: Linear                       # [D, H*3*hd] fused (models/fuse.py)
    wo: Linear                         # [D, D]
    ffn_norm: jax.Array                # [n_embd] f32
    w13: Linear                        # [D, 2F] fused
    w2: Linear                         # [F, D]
    lora_wq: LoraTerm | None = None
    lora_wk: LoraTerm | None = None
    lora_wv: LoraTerm | None = None
    lora_wo: LoraTerm | None = None
    lora_w1: LoraTerm | None = None
    lora_w2: LoraTerm | None = None
    lora_w3: LoraTerm | None = None

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
    tok_embeddings: Embedding          # [n_vocab, n_embd]
    norm: jax.Array                    # [n_embd] f32
    output: Linear                     # [n_embd, n_vocab]
    layers: list[LayerParams]
    lora_output: LoraTerm | None = None

    def tree_flatten(self):
        return (self.tok_embeddings, self.norm, self.output, self.layers,
                self.lora_output), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class ForwardConfig:
    """Static (hashable) trace-time configuration."""
    n_head: int                     # LOCAL head count (global/tp under shard_map)
    n_rot: int
    rms_eps: float = 1e-6
    w_dtype: str = "bfloat16"       # MXU input dtype for dequantized weights
    act_dtype: str = "float32"      # residual-stream dtype
    use_pallas: Any = None          # None = auto by backend/M
    all_logits: bool = False        # reference should_put_all_logits
    # KV write mode: "dus" (single shared offset — the single-stream session)
    # or "scatter" (per-row positions — the continuous-batching engine).
    kv_update: str = "dus"
    # Tensor-parallel axis name when running inside shard_map over a Mesh
    # (parallel/sharding.py). None = single-device semantics. With an axis:
    # wqkv/w13 and the output head are output-sharded, wo/w2 are
    # reduction-sharded (psum), embeddings are vocab-sharded — the compute
    # realization of the reference's file-shard axis table
    # (include/tensor/utils.hpp:101-112).
    tp_axis: str | None = None
    vocab_size: int = 0             # GLOBAL vocab (needed when tp_axis set)
    # Sequence-parallel axis (parallel/ring.py): the KV cache's sequence
    # axis is sharded over this mesh axis (cache row == global position).
    # Prefill runs ring attention over ppermute'd K/V chunks; decode merges
    # per-shard partial softmaxes with pmax/psum. Composes with tp_axis
    # (heads on tp, sequence on sp). Long-context support beyond one chip's
    # HBM — the reference has no analog (n_ctx bounded by host RAM).
    sp_axis: str | None = None
    sp_size: int = 1                # size of sp_axis (static, for the ring)
    # Chunked sequence-parallel ingest: seed the ring's online softmax with
    # attention over the cache prefix (rows < n_past) so windows can arrive
    # in n_batch chunks like the session's ingest loop. False keeps the
    # fresh-window-only trace (one einsum cheaper).
    sp_chunked: bool = False
    # Caller's promise that this trace only ever runs with n_past == 0
    # (fresh-prompt prefill). Lets attention use the Pallas flash kernel
    # (online softmax, no [T, S] scores in HBM) over just the in-window
    # K/V instead of attending into the (empty) cache. Set by the prefill
    # entry points; decode traces must leave it False.
    flash_prefill: bool = False
    # Route large-M (prefill) q4_0 matmuls through the activation-quantized
    # int8 MXU kernel (kernels/q4_matmul.q4_matmul_prefill_int8): ~2x the
    # bf16 prefill matmul rate for ~0.5% bounded requant noise — the TPU
    # realization of the reference's q8_0-activation compute path
    # (lib/ggml.c:8105-8119 — run unconditionally there). Tri-state: None
    # defers to the FASTLLAMA_PREFILL_INT8 env var (read at trace time),
    # whose unset default is ON for bf16 mode and OFF for the f32 parity
    # mode; an explicit True/False PINS the path regardless of the env var
    # — so False always means the bit-faithful bf16 dequant.
    prefill_int8: bool | None = None

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
    """y = x @ W for quantized or dense weights; f32 result."""
    if isinstance(w, QuantMatmulWeight):
        return q4_matmul(x, w, use_pallas=cfg.use_pallas, w_dtype=cfg.w_jdtype,
                         prefill_int8=cfg.prefill_int8)
    precision = (jax.lax.Precision.HIGHEST
                 if w.dtype == jnp.float32 else None)
    return jnp.dot(x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32, precision=precision)


def embed_tokens(table: Embedding, tokens: jax.Array, dtype,
                 cfg: "ForwardConfig | None" = None) -> jax.Array:
    if isinstance(table, QuantEmbedding):
        n_local = table.qs.shape[0]
    else:
        n_local = table.shape[0]

    if cfg is not None and cfg.tp_axis is not None:
        # Vocab-sharded lookup: each shard gathers its local rows for ids in
        # its range, zeros the rest, and a psum over the tp axis assembles
        # the full embedding.
        shard = jax.lax.axis_index(cfg.tp_axis)
        offset = shard * n_local
        local_ids = tokens - offset
        valid = (local_ids >= 0) & (local_ids < n_local)
        local_ids = jnp.clip(local_ids, 0, n_local - 1)
        if isinstance(table, QuantEmbedding):
            emb = dequant_embedding_rows(table, local_ids, dtype=dtype)
        else:
            emb = jnp.take(table, local_ids, axis=0).astype(dtype)
        emb = jnp.where(valid[..., None], emb, 0)
        return jax.lax.psum(emb, cfg.tp_axis)

    # Clamp instead of jnp's NaN-fill gather: padded/garbage slots in bucketed
    # batches must not poison the whole forward pass.
    tokens = jnp.clip(tokens, 0, n_local - 1)
    if isinstance(table, QuantEmbedding):
        return dequant_embedding_rows(table, tokens, dtype=dtype)
    return jnp.take(table, tokens, axis=0).astype(dtype)


def _rope_qk(q, k, positions, cfg: ForwardConfig, tables=None):
    """RoPE q and k. With precomputed per-lane tables (cos, sin_signed —
    computed ONCE per forward from the position grid), the natural-lane
    formulation applies; otherwise the reshape-based rope_interleaved.
    The lane path saves ~70 us/layer of size-2-lane-axis relayout plus the
    per-layer transcendental chains at prefill (profiled round 5)."""
    if tables is None:
        return (rope_interleaved(q, positions, cfg.n_rot),
                rope_interleaved(k, positions, cfg.n_rot))
    cos_l, sin_s = tables
    return (rope_interleaved_lanes(q, cos_l, sin_s, cfg.n_rot),
            rope_interleaved_lanes(k, cos_l, sin_s, cfg.n_rot))


def _write_kv(buf: jax.Array, val: jax.Array, positions: jax.Array,
              cfg: ForwardConfig) -> jax.Array:
    """Write [B, T, H, Dh] values into the [B, S, H*Dh] cache.

    "dus": one shared offset (positions[0,0]) — XLA updates the donated
    buffer in place. "scatter": per-row positions with mode='drop' (padded
    bucket tails past n_ctx are discarded) — the batched engine's per-slot
    path. Static-shape mirrors of ggml's strided view copy
    (lib/llama.cpp:336-343)."""
    b, t = val.shape[:2]
    val = val.reshape(b, t, -1).astype(buf.dtype)
    if cfg.kv_update == "dus":
        return jax.lax.dynamic_update_slice(
            buf, val, (0, positions[0, 0], 0))
    b_idx = jnp.arange(b)[:, None]
    return buf.at[b_idx, positions].set(val, mode="drop")


def _flash_viable(cfg: ForwardConfig, t: int, hd: int) -> bool:
    """Static gate for the flash-prefill path: TPU backend, lane-aligned
    shapes (Mosaic needs 128-multiples), production bf16 mode (the f32
    parity contract keeps the HIGHEST-precision einsum path)."""
    return (cfg.flash_prefill and cfg.sp_axis is None
            and t >= 128 and t % 128 == 0
            and hd % 128 == 0 and cfg.w_jdtype != jnp.float32
            and jax.default_backend() == "tpu")


def _flash_prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             hd: int) -> jax.Array:
    """Causal flash attention over the prompt window (n_past == 0 only).

    q/k/v: [B, T, H, Dh] post-RoPE. Returns [B, T, H, Dh] f32. Uses JAX's
    production Pallas kernel (online softmax over K tiles, f32 running
    stats in VMEM — see utils notes; the [T, T] scores matrix never touches
    HBM, unlike the reference's full diag_mask_inf+softmax materialization,
    lib/llama.cpp:346-403)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )
    import math
    t = q.shape[1]
    blk = min(t, 512)
    bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1)
    qf = q.swapaxes(1, 2).astype(jnp.bfloat16)   # [B, H, T, Dh]
    kf = k.swapaxes(1, 2).astype(jnp.bfloat16)
    vf = v.swapaxes(1, 2).astype(jnp.bfloat16)
    o = flash_attention(qf, kf, vf, causal=True,
                        sm_scale=1.0 / math.sqrt(hd), block_sizes=bs)
    return o.swapaxes(1, 2).astype(jnp.float32)


def _attention(x: jax.Array, layer: LayerParams, positions: jax.Array,
               kv: KVPair, cfg: ForwardConfig,
               rope_ls: "tuple[jax.Array, jax.Array] | None" = None,
               rope_bt: "tuple[jax.Array, jax.Array] | None" = None):
    """Self-attention for one layer.

    x: [B, T, D]; positions: [B, T] absolute; kv: ([B,S,H*Dh], [B,S,H*Dh]).
    rope_ls: decode-path per-lane RoPE tables (cos, sin) from
    rope_lane_tables, computed once per step in `forward`.
    Returns (attn_out [B, T, D], new kv pair).
    """
    b, t, d = x.shape
    h = cfg.n_head            # local heads (= global heads / tp under shard_map)
    kv_k, kv_v = kv
    s = kv_k.shape[1]

    qkv = apply_linear(x, layer.wqkv, cfg)

    if (rope_ls is not None and t == 1 and cfg.sp_axis is None
            and layer.lora_wq is None and layer.lora_wk is None
            and layer.lora_wv is None
            and cfg.w_jdtype != jnp.float32
            and jax.default_backend() == "tpu"):
        # Fully-fused decode attention: RoPE(q,k) + in-place cache write +
        # attention in ONE kernel consuming the raw fused qkv (the kernel
        # windows out q/k/v itself — no split_qkv, no rope relayouts, no
        # separate dynamic_update_slice; see kernels/decode_attention.py).
        import math
        hd = qkv.shape[-1] // (3 * h)
        if decode_attn_supported(s, hd):
            from ..kernels.decode_attention import decode_attention_fused
            ctx, kv_k, kv_v = decode_attention_fused(
                qkv, kv_k, kv_v, positions[:, 0], rope_ls[0], rope_ls[1],
                head_dim=hd, n_rot=cfg.n_rot, scale=1.0 / math.sqrt(hd))
            ctx = ctx.astype(cfg.act_jdtype)
            out = apply_linear(ctx, layer.wo, cfg)
            if layer.lora_wo is not None:
                out = out + apply_lora(ctx, layer.lora_wo)
            if cfg.tp_axis is not None:
                out = jax.lax.psum(out, cfg.tp_axis)
            return out.astype(cfg.act_jdtype), (kv_k, kv_v)

    no_qkv_lora = (layer.lora_wq is None and layer.lora_wk is None
                   and layer.lora_wv is None)
    if rope_bt is not None and no_qkv_lora:
        # Rope the contiguous [Q|K] prefix of the fused qkv in ONE pass
        # (the per-lane tables broadcast over the doubled head axis): one
        # slice materialization + one rotate instead of two of each
        # (~0.9 ms/step at 7B/512, profiled round 5).
        d3 = qkv.shape[-1]
        d = d3 // 3
        hd = d // h
        qk = qkv[..., :2 * d].reshape(b, t, 2 * h, hd)
        qk = rope_interleaved_lanes(qk, rope_bt[0], rope_bt[1], cfg.n_rot)
        q = qk[:, :, :h]
        k = qk[:, :, h:]
        v = qkv[..., 2 * d:].reshape(b, t, h, hd)
    else:
        q, k, v = split_qkv(qkv, h)
        hd = q.shape[-1]
        if layer.lora_wq is not None:
            q = q + apply_lora(x, layer.lora_wq).reshape(b, t, h, hd)
        if layer.lora_wk is not None:
            k = k + apply_lora(x, layer.lora_wk).reshape(b, t, h, hd)
        if layer.lora_wv is not None:
            v = v + apply_lora(x, layer.lora_wv).reshape(b, t, h, hd)
        q, k = _rope_qk(q, k, positions, cfg, rope_bt)

    if cfg.sp_axis is None:
        kv_k = _write_kv(kv_k, k, positions, cfg)
        kv_v = _write_kv(kv_v, v, positions, cfg)

    def finish(ctx):
        ctx = ctx.reshape(b, t, h * hd).astype(cfg.act_jdtype)
        out = apply_linear(ctx, layer.wo, cfg)
        if layer.lora_wo is not None:
            out = out + apply_lora(ctx, layer.lora_wo)
        if cfg.tp_axis is not None:
            # wo is reduction-sharded over heads: sum partials over ICI
            out = jax.lax.psum(out, cfg.tp_axis)
        return out.astype(cfg.act_jdtype), (kv_k, kv_v)

    if cfg.sp_axis is not None:
        # Sequence-parallel attention (parallel/ring.py): the cache's S axis
        # is sharded over cfg.sp_axis with cache row == global position.
        import math
        from ..parallel.ring import (
            ring_prefill, sp_decode_attention, sp_write_decode,
        )
        scale = 1.0 / math.sqrt(hd)
        # f32 parity mode must pin HIGHEST like the slab einsums below.
        sp_prec = (jax.lax.Precision.HIGHEST
                   if cfg.w_jdtype == jnp.float32 else None)
        if t == 1:
            kv_k, kv_v = sp_write_decode(kv_k, kv_v, k, v, positions[:, 0],
                                         cfg.sp_axis)
            return finish(sp_decode_attention(
                q, kv_k, kv_v, positions[:, 0], cfg.sp_axis, h, scale,
                precision=sp_prec))
        win_start = None
        if cfg.sp_chunked:
            # global window start (== n_past): shard i's first local
            # position minus its chunk offset in the window
            win_start = (positions[:, 0]
                         - jax.lax.axis_index(cfg.sp_axis) * t)
        ctx, kv_k, kv_v = ring_prefill(q, k, v, kv_k, kv_v, positions,
                                       cfg.sp_axis, cfg.sp_size, scale,
                                       precision=sp_prec,
                                       win_start=win_start)
        return finish(ctx)

    if _flash_viable(cfg, t, hd):
        # Fresh-prompt prefill: attend over the just-computed in-window K/V
        # with the Pallas flash kernel (equivalent to the masked einsum path
        # when n_past == 0, which cfg.flash_prefill asserts). ~4x higher MXU
        # occupancy at T=512 than the unfused einsums below.
        return finish(_flash_prefill_attention(q, k, v, hd))

    if (t == 1 and cfg.w_jdtype != jnp.float32
            and decode_attn_supported(s, hd)
            and jax.default_backend() == "tpu"):
        # Decode: one fused Pallas kernel per layer over the updated cache
        # (masked to s <= n_past, so the scatter above is the only write).
        import math
        ctx = decode_attention(q.reshape(b, 1, h * hd), kv_k, kv_v,
                               positions[:, 0], head_dim=hd,
                               scale=1.0 / math.sqrt(hd))
        return finish(ctx)

    keys = kv_k.reshape(b, s, h, hd).astype(jnp.float32)   # [B, S, H, Dh]
    vals = kv_v.reshape(b, s, h, hd).astype(jnp.float32)

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
    return finish(ctx)


def _ffn(x: jax.Array, layer: LayerParams, cfg: ForwardConfig) -> jax.Array:
    g13 = apply_linear(x, layer.w13, cfg)
    gate, up = split_w13(g13)
    if layer.lora_w1 is not None:
        gate = gate + apply_lora(x, layer.lora_w1)
    if layer.lora_w3 is not None:
        up = up + apply_lora(x, layer.lora_w3)
    act = jax.nn.silu(gate) * up
    act = act.astype(cfg.act_jdtype)
    out = apply_linear(act, layer.w2, cfg)
    if layer.lora_w2 is not None:
        out = out + apply_lora(act, layer.lora_w2)
    if cfg.tp_axis is not None:
        # w2 is reduction-sharded over the ffn dim
        out = jax.lax.psum(out, cfg.tp_axis)
    return out.astype(cfg.act_jdtype)


def forward(params: LlamaParams, tokens: jax.Array, n_past: jax.Array,
            kv_caches: list[KVPair], cfg: ForwardConfig,
            last_idx: jax.Array | None = None):
    """The transformer forward pass.

    Args:
      tokens: [B, T] int32 (T static; padded tokens allowed — their logits
        and cache slots are garbage that later writes overwrite).
      n_past: scalar int32 — number of tokens already in the cache.
      kv_caches: per-layer (k, v) pairs, each [B, S, H*Dh].
      last_idx: scalar int32 — index of the last *valid* token within the
        (possibly padded) T window; defaults to T-1. The non-all-logits
        output head and the embeddings tap read this row.
    Returns:
      (logits, kv_caches, embeddings):
        logits [B, T, n_vocab] f32 if cfg.all_logits else [B, 1, n_vocab]
        embeddings [B, D] f32 — final pre-output hidden of the last valid
        token (the reference's embeddings tap, lib/llama.cpp:455-460).
    """
    b, t = tokens.shape
    act_dtype = cfg.act_jdtype
    if last_idx is None:
        last_idx = jnp.int32(t - 1)

    # n_past may be a scalar (single stream) or [B] (continuous batching:
    # each slot decodes at its own depth; kv_update must be "scatter").
    n_past = jnp.asarray(n_past, jnp.int32)
    offsets = n_past.reshape(-1, 1)                       # [1,1] or [B,1]
    positions = offsets + jnp.arange(t, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (b, t))
    if cfg.sp_axis is not None and t > 1:
        # Sequence-parallel prefill: tokens arrive T-sharded over sp_axis,
        # so this shard's window starts at its chunk offset.
        positions = positions + jax.lax.axis_index(cfg.sp_axis) * t

    x = embed_tokens(params.tok_embeddings, tokens, act_dtype, cfg)

    # Decode-path RoPE tables, shared by every layer's fused attention
    # kernel (one tiny XLA chain per step instead of 2 rope chains/layer).
    rope_ls = None
    rope_bt = None
    w0 = params.layers[0].wqkv
    n3 = (min(w0.n_logical, w0.qs.shape[1])
          if isinstance(w0, QuantMatmulWeight) else w0.shape[1])
    hd0 = n3 // (3 * cfg.n_head)
    if (t == 1 and cfg.sp_axis is None
            and jax.default_backend() == "tpu"
            and cfg.w_jdtype != jnp.float32):
        from ..kernels.decode_attention import rope_lane_tables
        rope_ls = rope_lane_tables(positions[:, 0], hd0, cfg.n_rot)
    elif t > 1:
        rope_bt = rope_lane_tables_bt(positions, hd0, cfg.n_rot)

    new_kv: list[KVPair] = []
    for layer, kv in zip(params.layers, kv_caches):
        attn_in = rms_norm(x, layer.attention_norm, cfg.rms_eps)
        attn_out, kv = _attention(attn_in, layer, positions, kv, cfg,
                                  rope_ls, rope_bt)
        new_kv.append(kv)
        x = x + attn_out
        ffn_in = rms_norm(x, layer.ffn_norm, cfg.rms_eps)
        x = x + _ffn(ffn_in, layer, cfg)

    x = rms_norm(x, params.norm, cfg.rms_eps)
    if cfg.sp_axis is not None and t > 1:
        # last_idx is GLOBAL; the owning shard contributes its row, the
        # psum replicates it (zeros elsewhere) so the head input and the
        # embeddings tap are whole on every shard.
        base = jax.lax.axis_index(cfg.sp_axis) * t
        loc = jnp.clip(last_idx - base, 0, t - 1)
        x_last = jax.lax.dynamic_slice_in_dim(x, loc, 1, axis=1)
        own = (last_idx >= base) & (last_idx < base + t)
        x_last = jax.lax.psum(jnp.where(own, x_last, 0), cfg.sp_axis)
    else:
        x_last = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)  # [B,1,D]
    embeddings = x_last[:, 0, :].astype(jnp.float32)

    head_in = x if cfg.all_logits else x_last
    logits = apply_linear(head_in, params.output, cfg)
    if params.lora_output is not None:
        logits = logits + apply_lora(head_in.astype(jnp.float32),
                                     params.lora_output)
    if cfg.tp_axis is not None:
        # the output head is vocab-sharded: assemble full logits over ICI
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)
    return logits.astype(jnp.float32), new_kv, embeddings


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv_caches",))
def forward_jit(params, tokens, n_past, kv_caches, cfg: ForwardConfig,
                last_idx=None):
    return forward(params, tokens, n_past, kv_caches, cfg, last_idx)


_FWD_DECODE = None


def forward_jit_decode(params, tokens, n_past, kv_caches,
                       cfg: ForwardConfig, last_idx=None):
    """forward_jit with the decode compiler options (utils/xla_opts.py):
    MSA operand pre-staging suppressed — at 13B dims it exposes ~1.4
    ms/step of slice waits in front of the weight kernels. Built lazily so
    importing the module never touches the backend."""
    global _FWD_DECODE
    if _FWD_DECODE is None:
        from ..utils.xla_opts import decode_compiler_options
        _FWD_DECODE = jax.jit(
            forward, static_argnames=("cfg",),
            donate_argnames=("kv_caches",),
            compiler_options=decode_compiler_options())
    return _FWD_DECODE(params, tokens, n_past, kv_caches, cfg, last_idx)


def _apply_qkv_lora(x, layer: LayerParams, q, k, v):
    """Attention-projection LoRA terms for the paged paths (the slab path
    applies them in _attention; FFN terms come via the shared _ffn)."""
    b, t, h, hd = q.shape
    if layer.lora_wq is not None:
        q = q + apply_lora(x, layer.lora_wq).reshape(b, t, h, hd)
    if layer.lora_wk is not None:
        k = k + apply_lora(x, layer.lora_wk).reshape(b, t, h, hd)
    if layer.lora_wv is not None:
        v = v + apply_lora(x, layer.lora_wv).reshape(b, t, h, hd)
    return q, k, v


def forward_paged_decode(params: LlamaParams, tokens: jax.Array,
                         lengths: jax.Array, page_tables: jax.Array,
                         k_pages: list[jax.Array], v_pages: list[jax.Array],
                         page_ids: jax.Array, offsets: jax.Array,
                         cfg: ForwardConfig, paged_attn=None):
    """One decode step over a paged KV cache (engine/paged_kv.py).

    Args:
      tokens: [B, 1]; lengths: [B] tokens already resident (the new token's
        position); page_tables: [B, pages_per_seq]; k_pages/v_pages: per
        layer [H, P, ps, Dh]; page_ids/offsets: [B] physical write location
        of the new token (precomputed by PagedKVManager).
      paged_attn: attention impl f(q, kp, vp, lengths, tables) -> [B, H, D];
        defaults to the gather-based reference (use paged_attention_tpu on
        TPU for the DMA/online-softmax Pallas kernel).
    Returns (logits [B, 1, V], k_pages, v_pages).
    """
    from ..engine.paged_kv import paged_attention_reference, write_tokens_paged
    from ..kernels.kv_write import paged_kv_write, paged_kv_write_supported
    if paged_attn is None:
        paged_attn = paged_attention_reference

    b = tokens.shape[0]
    act_dtype = cfg.act_jdtype
    h = cfg.n_head
    positions = lengths[:, None]                     # [B, 1]
    ps, hd0 = k_pages[0].shape[2], k_pages[0].shape[3]
    # In-place Pallas write on TPU (kernels/kv_write.py — kills the ~14
    # ms/step of defensive pool copies the scatter fallback provokes);
    # XLA scatter elsewhere and for tiny test shapes.
    use_write_kernel = (jax.default_backend() == "tpu"
                        and paged_kv_write_supported(ps, hd0))

    x = embed_tokens(params.tok_embeddings, tokens, act_dtype, cfg)
    rope_bt = rope_lane_tables_bt(positions, hd0, cfg.n_rot)

    new_kp, new_vp = [], []
    for layer, kp, vp in zip(params.layers, k_pages, v_pages):
        attn_in = rms_norm(x, layer.attention_norm, cfg.rms_eps)
        qkv = apply_linear(attn_in, layer.wqkv, cfg)
        q, k, v = split_qkv(qkv, h)
        q, k, v = _apply_qkv_lora(attn_in, layer, q, k, v)
        hd = q.shape[-1]
        q, k = _rope_qk(q, k, positions, cfg, rope_bt)

        if use_write_kernel:
            kp, vp = paged_kv_write(kp, vp, k[:, 0], v[:, 0],
                                    page_ids, offsets)
        else:
            kp, vp = write_tokens_paged(kp, vp, k, v, page_ids[:, None],
                                        offsets[:, None])
        new_kp.append(kp)
        new_vp.append(vp)

        ctx = paged_attn(q[:, 0], kp, vp, lengths + 1, page_tables)
        ctx = ctx.reshape(b, 1, h * hd).astype(act_dtype)
        out = apply_linear(ctx, layer.wo, cfg)
        if layer.lora_wo is not None:
            out = out + apply_lora(ctx, layer.lora_wo)
        if cfg.tp_axis is not None:
            out = jax.lax.psum(out, cfg.tp_axis)
        x = x + out.astype(act_dtype)
        ffn_in = rms_norm(x, layer.ffn_norm, cfg.rms_eps)
        x = x + _ffn(ffn_in, layer, cfg)

    x = rms_norm(x, params.norm, cfg.rms_eps)
    logits = apply_linear(x, params.output, cfg)
    if cfg.tp_axis is not None:
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)
    return logits.astype(jnp.float32), new_kp, new_vp


def forward_paged_prefill(params: LlamaParams, tokens: jax.Array,
                          last_idx: jax.Array, page_ids: jax.Array,
                          offsets: jax.Array,
                          k_pages: list[jax.Array], v_pages: list[jax.Array],
                          cfg: ForwardConfig):
    """Prefill a FRESH sequence into the paged cache.

    A fresh slot needs no cache reads: causal self-attention over the prompt
    block itself, with the block's K/V scattered into the sequence's pages
    for subsequent paged decode. tokens [1, T] (bucketed; padded tail writes
    carry sentinel page_ids that drop). Returns (last_logits [1, V],
    k_pages, v_pages).
    """
    from ..engine.paged_kv import write_tokens_paged

    b, t = tokens.shape
    act_dtype = cfg.act_jdtype
    h = cfg.n_head
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    x = embed_tokens(params.tok_embeddings, tokens, act_dtype, cfg)
    rope_bt = None

    attn_prec = (jax.lax.Precision.HIGHEST
                 if cfg.w_jdtype == jnp.float32 else None)
    new_kp, new_vp = [], []
    for layer, kp, vp in zip(params.layers, k_pages, v_pages):
        attn_in = rms_norm(x, layer.attention_norm, cfg.rms_eps)
        qkv = apply_linear(attn_in, layer.wqkv, cfg)
        q, k, v = split_qkv(qkv, h)
        q, k, v = _apply_qkv_lora(attn_in, layer, q, k, v)
        hd = q.shape[-1]
        if rope_bt is None:
            rope_bt = rope_lane_tables_bt(positions, hd, cfg.n_rot)
        q, k = _rope_qk(q, k, positions, cfg, rope_bt)

        kp, vp = write_tokens_paged(kp, vp, k, v, page_ids[None, :],
                                    offsets[None, :])
        new_kp.append(kp)
        new_vp.append(vp)

        if _flash_viable(cfg, t, hd):
            ctx = _flash_prefill_attention(q, k, v, hd)
        else:
            scale = 1.0 / jnp.sqrt(jnp.float32(hd))
            scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                                k.astype(jnp.float32),
                                precision=attn_prec) * scale
            causal = (jnp.arange(t)[None, :] <= jnp.arange(t)[:, None])
            scores = jnp.where(causal[None, None], scores, jnp.float32(-1e30))
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32),
                             precision=attn_prec)
        ctx = ctx.reshape(b, t, h * hd).astype(act_dtype)
        out = apply_linear(ctx, layer.wo, cfg)
        if layer.lora_wo is not None:
            out = out + apply_lora(ctx, layer.lora_wo)
        if cfg.tp_axis is not None:
            out = jax.lax.psum(out, cfg.tp_axis)
        x = x + out.astype(act_dtype)
        ffn_in = rms_norm(x, layer.ffn_norm, cfg.rms_eps)
        x = x + _ffn(ffn_in, layer, cfg)

    x = rms_norm(x, params.norm, cfg.rms_eps)
    x_last = jax.lax.dynamic_slice_in_dim(x, last_idx, 1, axis=1)
    logits = apply_linear(x_last, params.output, cfg)
    if cfg.tp_axis is not None:
        logits = jax.lax.all_gather(logits, cfg.tp_axis, axis=-1, tiled=True)
    return logits[:, 0].astype(jnp.float32), new_kp, new_vp


def init_kv_cache(hp: HyperParams, batch: int, n_ctx: int,
                  dtype=jnp.bfloat16) -> list[KVPair]:
    """Allocate the KV cache (reference: KVCacheBuffer::init, llama.cpp:24-51;
    dtype is configurable where the reference hard-codes f32). Per-layer
    buffers keep donated updates in place; heads flat in the last axis."""
    shape = (batch, n_ctx, hp.n_head * hp.head_dim)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(hp.n_layer)]
