"""Mesh + sharding: the framework's multi-chip story.

The reference has no compute parallelism beyond threads (SURVEY.md §2.3);
its only sharding concept is the file-level ByRows/ByColumns table
(include/tensor/utils.hpp:101-112) used to *merge* Meta's model-parallel
checkpoints. Here that same name->axis table becomes real compute sharding:

  output-sharded on "model" (columns of the [K, N] layout):
      wqkv (whole heads per shard, see models/fuse.py), w13 (gate/up pairs),
      the output head (vocab)
  reduction-sharded (rows -> psum over ICI):  wo, w2
  vocab-sharded:                              tok_embeddings
  replicated:                                 norms
  KV cache:                                   heads on "model", batch on "data"

The forward pass runs under `shard_map` with explicit `psum` /
`all_gather` collectives over ICI (models/llama.py tp_axis branches) —
Megatron-style TP, two psums per layer. Weights enter pre-sharded via
NamedSharding device_puts so each chip only ever holds its shard.

Spec trees use pytree *prefixes*: a single PartitionSpec at a
QuantMatmulWeight position applies to both its qs and scales planes (their
specs always coincide in this layout).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (
    ForwardConfig, KVPair, LayerParams, LlamaParams, LoraTerm, forward,
)

DATA_AXIS = "data"
MODEL_AXIS = "model"

OUT_SHARDED = P(None, MODEL_AXIS)    # [K, N] with N split
RED_SHARDED = P(MODEL_AXIS, None)    # [K, N] with K split (psum after)
REPLICATED = P()

# per-layer KV buffer [B, S, H*Dh]: batch on data, head columns on model
# (tp divides n_head, so the flat split lands exactly on head boundaries)
KV_SPEC = P(DATA_AXIS, None, MODEL_AXIS)

# sequence-parallel KV buffer: the SEQUENCE axis sharded over the data axis
# (long-context mode, parallel/ring.py) — batch replicated, heads on model
SEQ_KV_SPEC = P(None, DATA_AXIS, MODEL_AXIS)


def make_mesh(n_data: int = 1, n_model: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _lora_spec(base_spec: P, t: LoraTerm | None):
    """LoRA term sharding follows its base weight: output-sharded bases shard
    b/delta columns; reduction-sharded bases shard a/delta rows (the partial
    sums ride the layer's existing psum)."""
    if t is None:
        return None
    if base_spec == OUT_SHARDED:
        return LoraTerm(
            delta=None if t.delta is None else OUT_SHARDED,
            a=None if t.a is None else REPLICATED,
            b=None if t.b is None else OUT_SHARDED)
    return LoraTerm(
        delta=None if t.delta is None else RED_SHARDED,
        a=None if t.a is None else RED_SHARDED,
        b=None if t.b is None else REPLICATED)


def params_pspec_tree(params: LlamaParams) -> LlamaParams:
    """A prefix tree of PartitionSpecs matching the params structure."""
    layers = []
    for layer in params.layers:
        layers.append(LayerParams(
            attention_norm=REPLICATED,
            wqkv=OUT_SHARDED,
            wo=RED_SHARDED,
            ffn_norm=REPLICATED,
            w13=OUT_SHARDED,
            w2=RED_SHARDED,
            lora_wq=_lora_spec(OUT_SHARDED, layer.lora_wq),
            lora_wk=_lora_spec(OUT_SHARDED, layer.lora_wk),
            lora_wv=_lora_spec(OUT_SHARDED, layer.lora_wv),
            lora_wo=_lora_spec(RED_SHARDED, layer.lora_wo),
            lora_w1=_lora_spec(OUT_SHARDED, layer.lora_w1),
            lora_w2=_lora_spec(RED_SHARDED, layer.lora_w2),
            lora_w3=_lora_spec(OUT_SHARDED, layer.lora_w3),
        ))
    return LlamaParams(
        tok_embeddings=P(MODEL_AXIS, None),     # vocab rows split
        norm=REPLICATED,
        output=OUT_SHARDED,
        layers=layers,
        lora_output=_lora_spec(OUT_SHARDED, params.lora_output),
    )


def _model_sharded_already(w) -> bool:
    """True when a fused weight already carries a model-axis NamedSharding —
    i.e. shard_params ran before (re-sharding after LoRA attach must not
    re-permute the columns a second time)."""
    from ..quant.tensor import QuantMatmulWeight
    arr = w.qs if isinstance(w, QuantMatmulWeight) else w
    s = getattr(arr, "sharding", None)
    return isinstance(s, NamedSharding) and MODEL_AXIS in jax.tree.leaves(
        tuple(s.spec))


def _permute_cols(w, order: np.ndarray):
    """Gather columns of a fused weight (packed planes or dense) into the
    per-shard block order (models/fuse.shard_col_order): NamedSharding hands
    each device a contiguous 1/tp column slice, so the fused [Q|K|V] /
    [w1|w3] blocks must be re-laid as [Q_s|K_s|V_s | Q_s+1|...] first."""
    from ..quant.tensor import QuantMatmulWeight
    idx = jnp.asarray(order)
    if isinstance(w, QuantMatmulWeight):
        return QuantMatmulWeight(
            qs=jnp.take(w.qs, idx, axis=1),
            scales=jnp.take(w.scales, idx, axis=1),
            mins=None if w.mins is None else jnp.take(w.mins, idx, axis=1),
            n_logical=w.n_logical)
    return jnp.take(w, idx, axis=1)


def _strip_k_pad(w, k_logical: int):
    """Remove pack-time K padding (quant/tensor.good_pad_k) from a weight
    about to be reduction-sharded: the inert rows sit at the END of the
    global K, so splitting the padded array over the model axis would shift
    every shard's rows off its activation slice."""
    from ..quant.tensor import QBLOCK, QuantMatmulWeight
    if not isinstance(w, QuantMatmulWeight) or w.qs.shape[0] * 2 == k_logical:
        return w
    return QuantMatmulWeight(
        qs=w.qs[: k_logical // 2],
        scales=w.scales[: k_logical // QBLOCK],
        mins=None if w.mins is None else w.mins[: k_logical // QBLOCK],
        n_logical=w.n_logical)


def _strip_n_pad(w):
    """Sharded quant weights must be unpadded in N: the static n_logical aux
    cannot follow the shards (q4_matmul then trusts local shard widths), and
    a column split must land on real data. Pack-time N padding
    (quant/tensor.good_pad_n) sits at the END of N, so slicing it off is
    safe — single-device runs keep the padding for its bigger lane tiles."""
    from ..quant.tensor import QuantMatmulWeight
    if not isinstance(w, QuantMatmulWeight) or w.n_padded == w.n_logical:
        return w
    n = w.n_logical
    if n % 256:
        raise ValueError(
            f"cannot shard a quant weight with n_logical={n} (not a "
            f"multiple of 256 — the column shards would be lane-misaligned)")
    return QuantMatmulWeight(
        qs=w.qs[:, :n], scales=w.scales[:, :n],
        mins=None if w.mins is None else w.mins[:, :n], n_logical=n)


def _pad_per_shard(w, tp: int):
    """Re-pad an OUT_SHARDED fused quant weight PER SHARD so every local
    shard keeps large lane tiles.

    Shard-local widths often lose the 1024-lane tile that the unsharded
    weight had (7B w13 local 2*11008/4 = 5504 tiles at bn=128 — measured
    catastrophic for the kernel's DMA pipeline). Each of the tp contiguous
    column chunks gets its own inert tail padding (good_pad_n of the local
    width), and n_logical becomes the LOCAL logical width: the aux cannot
    differ per shard, but it doesn't need to — inside shard_map q4_matmul
    sees local arrays, computes n_eff = min(n_logical, local_width) =
    the local logical width, and slices the padding off before any
    consumer sees it. The weight must not be used OUTSIDE shard_map after
    this (the engine/runtime never do)."""
    from ..quant.tensor import QBLOCK, QuantMatmulWeight, good_pad_n
    if not isinstance(w, QuantMatmulWeight):
        return w
    n = w.n_logical
    if n % tp:
        raise ValueError(f"N={n} not divisible by tp={tp}")
    w_loc = n // tp
    n_pad = good_pad_n(w_loc)
    if n_pad == w_loc:
        return dataclasses.replace(w, n_logical=w_loc)
    pad = n_pad - w_loc
    affine = w.mins is not None
    pad_code = 0x00 if affine else 0x88

    def pad_chunks(plane, fill, dtype):
        chunks = []
        for s in range(tp):
            chunks.append(plane[:, s * w_loc:(s + 1) * w_loc])
            chunks.append(jnp.full((plane.shape[0], pad), fill, dtype))
        return jnp.concatenate(chunks, axis=1)

    return QuantMatmulWeight(
        qs=pad_chunks(w.qs, pad_code, jnp.uint8),
        scales=pad_chunks(w.scales, 0, w.scales.dtype),
        mins=None if w.mins is None else pad_chunks(w.mins, 0, w.mins.dtype),
        n_logical=w_loc)


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """device_put every leaf with its NamedSharding (weights pre-sharded)."""
    from ..quant.tensor import QuantMatmulWeight

    # Reduction-sharded weights (wo: K=n_embd, w2: K=n_ff) must shed their
    # pack-time K padding before the model-axis split; output-sharded fused
    # weights get their columns re-laid into per-shard blocks so contiguous
    # NamedSharding slices carry [Q_s|K_s|V_s] / [w1_s|w3_s].
    from ..models.fuse import shard_col_order
    tp = mesh.shape[MODEL_AXIS]
    layers = []
    for layer in params.layers:
        # Guard on w13: once a layer is model-sharded its n_logical is the
        # LOCAL width (set by _pad_per_shard), so none of the global-width
        # arithmetic below may run again (re-shard after LoRA attach).
        if tp > 1 and not _model_sharded_already(layer.w13):
            n_embd = layer.attention_norm.shape[0]
            w13 = layer.w13
            n_ff = (w13.n_logical if isinstance(w13, QuantMatmulWeight)
                    else w13.shape[1]) // 2
            wqkv = _pad_per_shard(
                _permute_cols(_strip_n_pad(layer.wqkv),
                              shard_col_order(3 * n_embd, 3, tp)), tp)
            w13 = _pad_per_shard(
                _permute_cols(_strip_n_pad(w13),
                              shard_col_order(2 * n_ff, 2, tp)), tp)
            layer = dataclasses.replace(
                layer, wqkv=wqkv, w13=w13,
                wo=_strip_k_pad(_strip_n_pad(layer.wo), n_embd),
                w2=_strip_k_pad(_strip_n_pad(layer.w2), n_ff))
        layers.append(layer)
    output = params.output
    if tp > 1 and not _model_sharded_already(output):
        output = _pad_per_shard(_strip_n_pad(output), tp)
    params = dataclasses.replace(params, layers=layers, output=output)
    specs = params_pspec_tree(params)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def shard_kv(kv: list[KVPair], mesh: Mesh) -> list[KVPair]:
    sh = NamedSharding(mesh, KV_SPEC)
    return [(jax.device_put(k, sh), jax.device_put(v, sh)) for k, v in kv]


def shard_kv_seq(kv: list[KVPair], mesh: Mesh) -> list[KVPair]:
    """Sequence-sharded cache placement (long-context mode): S on the data
    axis, heads on the model axis. S must divide the data-axis size."""
    sh = NamedSharding(mesh, SEQ_KV_SPEC)
    return [(jax.device_put(k, sh), jax.device_put(v, sh)) for k, v in kv]


def make_seq_parallel_forward(mesh: Mesh, params: LlamaParams,
                              cfg: ForwardConfig, decode: bool = False,
                              chunked: bool = False):
    """Long-context forward over a sequence-sharded KV cache (parallel/ring).

    The mesh's data axis becomes the SEQUENCE axis (sp shards): each chip
    holds S/sp cache rows and — during prefill — runs matmuls/FFN on T/sp
    tokens, so both cache memory and prefill FLOPs scale out with sp.
    Composes with tensor parallelism on the model axis.

    decode=False (prefill): returns fn(params, tokens [B, T], n_past,
      kv_caches, last_idx) with tokens T-SHARDED over the data axis
      (T % sp == 0) and n_past == 0 (fresh window; cache row == global
      position). Ring attention rotates K/V chunks over ICI.
    decode=True: tokens [B, 1] replicated; the newest row is written on its
      owner shard, attention merges per-shard partials (split-S pmax/psum).

    Returns (logits, kv_caches, embeddings); logits are replicated except
    all_logits prefill, where they come back T-sharded and reassemble to
    the caller as a global [B, T, V].
    """
    sp = mesh.shape[DATA_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    if cfg.n_head % tp:
        raise ValueError(f"n_head={cfg.n_head} not divisible by tp={tp}")
    local_cfg = dataclasses.replace(
        cfg, n_head=cfg.n_head // tp, tp_axis=MODEL_AXIS,
        sp_axis=DATA_AXIS, sp_size=sp, sp_chunked=chunked)

    pspecs = params_pspec_tree(params)
    kv_specs = [(SEQ_KV_SPEC, SEQ_KV_SPEC)] * len(params.layers)
    tok_spec = P() if decode else P(None, DATA_AXIS)
    logits_spec = (P(None, DATA_AXIS, None)
                   if (cfg.all_logits and not decode) else P())
    in_specs = (pspecs, tok_spec, P(), kv_specs, P())
    out_specs = (logits_spec, kv_specs, P())

    def fwd(p, tokens, n_past, kv_caches, last_idx):
        return forward(p, tokens, n_past, kv_caches, local_cfg, last_idx)

    sharded = shard_map(fwd, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded, donate_argnums=(3,))


def make_sharded_forward(mesh: Mesh, params: LlamaParams, cfg: ForwardConfig):
    """Build a jitted shard_map forward over the mesh.

    cfg.n_head must be the GLOBAL head count; it is divided by the model-axis
    size here. Returns fn(params, tokens [B,T], n_past, kv_caches, last_idx)
    -> (logits, kv_caches, embeddings), with B divisible by the data axis.
    """
    tp = mesh.shape[MODEL_AXIS]
    if cfg.n_head % tp:
        raise ValueError(f"n_head={cfg.n_head} not divisible by tp={tp}")
    local_cfg = dataclasses.replace(
        cfg, n_head=cfg.n_head // tp, tp_axis=MODEL_AXIS,
        kv_update=cfg.kv_update)

    pspecs = params_pspec_tree(params)
    n_layers = len(params.layers)
    kv_specs = [(KV_SPEC, KV_SPEC)] * n_layers
    in_specs = (pspecs, P(DATA_AXIS, None), P(), kv_specs, P())
    out_specs = (P(DATA_AXIS, None, None), kv_specs, P(DATA_AXIS, None))

    def fwd(p, tokens, n_past, kv_caches, last_idx):
        return forward(p, tokens, n_past, kv_caches, local_cfg, last_idx)

    sharded = shard_map(fwd, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded, donate_argnums=(3,))
