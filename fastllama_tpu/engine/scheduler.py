"""Continuous-batching engine: many concurrent sessions over one model.

The reference is strictly single-stream (SURVEY.md §2.3 — its only
"batching" is the prompt-chunk loop). This engine is the north-star addition
(BASELINE.json configs #4/#5): a fixed pool of B slots decodes in lockstep,
each at its own cache depth, with new requests admitted into idle slots at
any step.

TPU-native design points:

  * One compiled decode step serves every slot: tokens [B, 1] with per-slot
    positions (models/llama.py accepts n_past as a [B] vector; the KV
    scatter path writes each row at its own offset, mode='drop' discards
    rows flagged inactive by an out-of-range position).
  * Multi-chip: with rcfg.mesh_shape=(dp, tp) the decode/prefill steps run
    under shard_map over a jax.sharding.Mesh — weights Megatron-sharded on
    the model axis (parallel/sharding.py), slots split over the data axis,
    KV heads on the model axis. This is what makes 30B/65B continuous
    batching reachable at all: 30B q4 (19.5 GB) needs tp>=2 on 16 GB chips.
    Sampling stays on device per data shard; only sampled token ids cross
    to the host.
  * Sampling parameters are per request (temp/top_k/top_p/repeat_penalty
    vectorized over slots in engine/sampling.sample_jax), matching the
    reference's per-generate() knobs (lib/bridge.cpp:240-312). The engine's
    top_k is the static cap per-request values are clamped to.
  * The host drains sampled tokens asynchronously: step() launches the next
    device step and only blocks on the readback from `drain_depth` steps
    ago, so the ~27 ms tunnel readback overlaps device compute instead of
    serializing with it. EOS/stop handling tolerates the lag by design —
    a slot that stopped k steps ago just produced k ignored tokens (drained
    entries are matched by request id, so a re-admitted slot never sees a
    previous occupant's stale tokens).
  * Slot state that must survive across steps lives on device (positions,
    active mask, last-n window, per-slot sampling params); host-side
    Request objects hold text streams and lifecycle.
"""
from __future__ import annotations

import collections
import dataclasses
import queue
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HyperParams, RuntimeConfig
from ..engine.logger import Logger, NULL_LOGGER
from ..engine.sampling import sample_jax
from ..engine.token_buffer import TokenBuffer
from ..engine.tokenizer import EOS_ID, Vocab, tokenize
from ..models.llama import ForwardConfig, LlamaParams, forward, init_kv_cache


@dataclasses.dataclass
class Request:
    prompt: str
    max_tokens: int = 128
    # sampling knobs: None = the engine's default. temp <= 0 decodes this
    # request greedily. top_k is clamped to the engine's static top_k cap.
    temp: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    repeat_penalty: Optional[float] = None
    stop_words: Sequence[str] = ()
    streaming_fn: Optional[Callable[[str], None]] = None
    # filled by the engine
    rid: int = -1
    slot: int = -1
    text: str = ""
    tokens_out: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    n_prompt: int = 0


@dataclasses.dataclass
class _Admission:
    """An in-flight chunked admission: the prompt's remaining chunks run
    one per engine step against a private [1, n_ctx] row cache."""
    slot_idx: int
    req: Request
    ids: list[int]
    n_done: int = 0
    last_logits: Optional[jax.Array] = None


@dataclasses.dataclass
class _Slot:
    req: Optional[Request] = None
    n_past: int = 0
    generated: int = 0
    buffer: Optional[TokenBuffer] = None
    stop_bytes: list[bytes] = dataclasses.field(default_factory=list)
    # False while a chunked admission is still prefilling this slot: the
    # slot is reserved (req set) but must not join decode launches or claim
    # drained tokens until _activate_slot flips it
    live: bool = False


class BatchEngine:
    def __init__(self, hp: HyperParams, params: LlamaParams, vocab: Vocab,
                 n_slots: int = 8, n_ctx: int = 2048,
                 rcfg: RuntimeConfig = RuntimeConfig(),
                 sampling_seed: int = 0,
                 top_k: int = 40, top_p: float = 0.95, temp: float = 0.8,
                 repeat_penalty: float = 1.0, last_n: int = 64,
                 kv_mode: str = "slab",
                 page_size: int = 64, total_pages: int = 0,
                 drain_depth: Optional[int] = None,
                 chunked_admission: bool = False,
                 logger: Logger = NULL_LOGGER):
        """kv_mode: "slab" reserves [n_slots, n_ctx] KV up front; "paged"
        shares a physical page pool (engine/paged_kv.py) so mixed-length
        sequences only hold the pages they fill. total_pages defaults to the
        slab-equivalent capacity. As of round 5 paged is FASTER at every
        measured length (B=8 7B: 766 vs 698 tok/s device aggregate; step
        9.98 vs ~11.0 ms at short lengths, 11.31 vs 11.05 near-full — the
        double-buffered page-gather kernel) and is the recommended serving
        mode; slab stays the default for the single-allocation simplicity.

        drain_depth: how many decode steps the host token drain lags the
        device (None = 2 on TPU where the readback costs ~27 ms over the
        tunnel, 0 elsewhere). 0 = fully synchronous.
        """
        self.hp = hp
        self.vocab = vocab
        self.rcfg = rcfg
        self.n_slots = n_slots
        self.n_ctx = n_ctx
        self.logger = logger
        self.top_k, self.top_p, self.temp = top_k, top_p, temp
        self.repeat_penalty, self.last_n_size = repeat_penalty, last_n
        self.kv_mode = kv_mode
        if drain_depth is None:
            drain_depth = 4 if jax.default_backend() == "tpu" else 0
        self.drain_depth = drain_depth
        # two-phase drain: (device array, entries) whose host copy is in
        # flight (copy_to_host_async); consumed one drain cycle later
        self._pending_drain = None
        # (tokens device array, per-slot rid snapshot) per launched step
        self._inflight: collections.deque[tuple[jax.Array, list[int]]] = \
            collections.deque()

        # -- mesh (multi-chip) setup ----------------------------------------
        self.mesh = None
        self.dp = self.tp = 1
        if rcfg.mesh_shape and int(np.prod(rcfg.mesh_shape)) > 1:
            from ..parallel.multihost import hybrid_mesh
            from ..parallel.sharding import shard_params
            dp, tp = (rcfg.mesh_shape if len(rcfg.mesh_shape) == 2
                      else (1, rcfg.mesh_shape[0]))
            if n_slots % dp:
                raise ValueError(f"n_slots={n_slots} not divisible by dp={dp}")
            if hp.n_head % tp:
                raise ValueError(f"n_head={hp.n_head} not divisible by tp={tp}")
            # DCN-aware when spanning hosts; plain mesh single-process
            self.mesh = hybrid_mesh(dp=dp, tp=tp)
            self.dp, self.tp = dp, tp
            params = shard_params(params, self.mesh)
            logger.log("BatchEngine", f"sharded over mesh dp={dp} tp={tp}\n")
        self.params = params

        kv_dtype = jnp.dtype(rcfg.kv_dtype)
        if kv_mode == "paged":
            from .paged_kv import PagedKVManager
            total_pages = total_pages or (n_slots * n_ctx) // page_size
            total_pages = -(-total_pages // self.dp) * self.dp
            self.pager = PagedKVManager(
                hp, n_slots=n_slots, page_size=page_size,
                total_pages=total_pages,
                pages_per_seq=-(-n_ctx // page_size), dtype=kv_dtype,
                dp=self.dp)
            if self.mesh is not None:
                # pools sharded over heads on the model axis and over the
                # page-id partitions on the data axis (the manager hands out
                # shard-local ids, so each dp shard's tables index straight
                # into its local pool slice)
                from jax.sharding import NamedSharding, PartitionSpec as P
                from ..parallel.sharding import DATA_AXIS, MODEL_AXIS
                sh = NamedSharding(self.mesh,
                                   P(MODEL_AXIS, DATA_AXIS, None, None))
                self.pager.k_pages = [jax.device_put(a, sh)
                                      for a in self.pager.k_pages]
                self.pager.v_pages = [jax.device_put(a, sh)
                                      for a in self.pager.v_pages]
            self.kv = None
        else:
            self.pager = None
            self.kv = init_kv_cache(hp, n_slots, n_ctx, kv_dtype)
            if self.mesh is not None:
                from ..parallel.sharding import shard_kv
                self.kv = shard_kv(self.kv, self.mesh)
        self.cfg = ForwardConfig(
            n_head=hp.n_head, n_rot=hp.n_rot, w_dtype=rcfg.weight_dtype,
            use_pallas=rcfg.use_pallas, kv_update="scatter",
            vocab_size=hp.n_vocab, prefill_int8=rcfg.prefill_int8)

        # device-side slot state
        self.d_tokens = jnp.zeros((n_slots, 1), jnp.int32)
        self.d_npast = jnp.zeros((n_slots,), jnp.int32)
        self.d_active = jnp.zeros((n_slots,), jnp.bool_)
        self.d_lastn = jnp.full((n_slots, last_n), -1, jnp.int32)
        self.d_temps = jnp.full((n_slots,), temp, jnp.float32)
        self.d_topk = jnp.full((n_slots,), top_k, jnp.int32)
        self.d_topp = jnp.full((n_slots,), top_p, jnp.float32)
        self.d_rp = jnp.full((n_slots,), repeat_penalty, jnp.float32)
        self._base_key = jax.random.PRNGKey(sampling_seed)
        # device-resident step counter: no per-step host->device scalar
        # transfer in the hot loop (the tunnel makes those expensive)
        self.d_step = jnp.uint32(0)

        self.slots = [_Slot() for _ in range(n_slots)]
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._next_rid = 0
        self._buckets = sorted({min(b, n_ctx) for b in rcfg.prefill_buckets}
                               | {n_ctx})

        if kv_mode == "paged":
            self._decode_fn = self._build_decode_paged()
            self._prefill_fn = self._build_prefill_paged()
            # (when self.mesh is set, both are shard_map-wrapped: pools
            # head-sharded on the model axis, everything else replicated)
        elif self.mesh is not None:
            self._decode_fn = self._build_decode_mesh()
            self._prefill_fn = self._build_prefill_mesh()
        else:
            self._decode_fn = self._build_decode()
            self._prefill_fn = self._build_prefill()

        # Chunked admission (single-device; slab or paged): the prompt
        # advances one n_batch-sized chunk per engine step against a
        # private [1, n_ctx] row cache instead of one monolithic bucketed
        # prefill, so an admission never freezes the other slots for more
        # than ~one chunk of device time. The session's ingest-loop
        # semantics (lib/bridge.cpp:215-232) applied to the engine. For
        # paged KV the finished rows scatter into the slot's pages at
        # activation (one write_tokens_paged pass — the same writer the
        # monolithic paged prefill uses).
        self.chunked_admission = chunked_admission and self.mesh is None
        if chunked_admission and not self.chunked_admission:
            logger.log_warn(
                "BatchEngine", "chunked admission is single-device only; "
                "falling back to monolithic admission\n")
        self._adm: Optional[_Admission] = None
        if self.chunked_admission:
            self._adm_chunk = max(8, min(rcfg.n_batch, n_ctx))
            self._adm_kv = init_kv_cache(hp, 1, n_ctx, kv_dtype)
            self._chunk_fn = self._build_ingest_chunk()
            self._splice_fn = (self._build_splice_paged()
                               if self.pager is not None
                               else self._build_splice())

    # -- compiled steps ------------------------------------------------------

    def _decode_core(self, cfg: ForwardConfig, dp_axis: str | None = None):
        """The decode-step body shared by the single-device and shard_map
        builders: forward + on-device per-slot sampling + state advance."""
        top_k_cap = self.top_k
        n_ctx = self.n_ctx

        def step(params, tokens, n_past, active, lastn, temps, topks, topps,
                 rps, key, step_i, kv):
            # inactive slots: position beyond n_ctx -> their KV writes drop
            eff_past = jnp.where(active, n_past, n_ctx + 1)
            logits, kv, _ = forward(params, tokens, eff_past, kv, cfg)
            step_key = jax.random.fold_in(key, step_i)
            if dp_axis is not None:
                # decorrelate data shards (each samples its own slot rows)
                step_key = jax.random.fold_in(
                    step_key, jax.lax.axis_index(dp_axis).astype(jnp.uint32))
            nxt = sample_jax(logits[:, -1, :], lastn, step_key,
                             top_k=top_k_cap, top_p=topps, temp=temps,
                             repeat_penalty=rps, top_k_v=topks)
            nxt = jnp.where(active, nxt, 0)
            lastn = jnp.where(active[:, None],
                              jnp.concatenate([lastn[:, 1:], nxt[:, None]],
                                              axis=1),
                              lastn)
            n_past = jnp.where(active, n_past + 1, n_past)
            tok_out = nxt[:, None]
            if dp_axis is not None:
                # Replicate the sampled tokens across the data axis (a [B]
                # int32 all-gather — trivial bytes, rides ICI or DCN). This
                # is the multi-host contract: every controller process sees
                # every token, so all hosts make identical stop/admit
                # decisions and the host drain never touches a
                # non-addressable shard (parallel/multihost.py).
                tok_out = jax.lax.all_gather(nxt, dp_axis, axis=0,
                                             tiled=True)[:, None]
            return tok_out, n_past, lastn, step_i + 1, kv

        return step

    def _build_decode(self):
        from ..utils.xla_opts import decode_compiler_options
        return jax.jit(self._decode_core(self.cfg), donate_argnums=(11,),
                       compiler_options=decode_compiler_options())

    def _build_decode_mesh(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.sharding import (
            DATA_AXIS, KV_SPEC, MODEL_AXIS, params_pspec_tree,
        )
        local_cfg = dataclasses.replace(
            self.cfg, n_head=self.hp.n_head // self.tp, tp_axis=MODEL_AXIS)
        step = self._decode_core(local_cfg, dp_axis=DATA_AXIS)

        pspecs = params_pspec_tree(self.params)
        kv_specs = [(KV_SPEC, KV_SPEC)] * self.hp.n_layer
        pd = P(DATA_AXIS)
        pd2 = P(DATA_AXIS, None)
        in_specs = (pspecs, pd2, pd, pd, pd2, pd, pd, pd, pd, P(), P(),
                    kv_specs)
        # tokens out replicated (all-gathered over dp inside the step)
        out_specs = (P(None, None), pd, pd2, P(), kv_specs)
        from ..utils.xla_opts import decode_compiler_options
        fn = shard_map(step, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return jax.jit(fn, donate_argnums=(11,),
                       compiler_options=decode_compiler_options())

    def _build_prefill(self):
        """Single-row prefill: run the prompt through a fresh [1, n_ctx]
        cache, then splice that row into the batched slab at `slot` — the
        prompt costs 1/n_slots of a full-batch forward."""
        cfg = dataclasses.replace(self.cfg, flash_prefill=True)
        n_ctx = self.n_ctx
        hp = self.hp
        kv_dtype = jnp.dtype(self.kv[0][0].dtype) if self.kv else None

        def prefill(params, tokens, slot, kv, last_idx):
            f = hp.n_head * hp.head_dim
            tmp = [(jnp.zeros((1, n_ctx, f), kv_dtype),
                    jnp.zeros((1, n_ctx, f), kv_dtype))
                   for _ in range(hp.n_layer)]
            logits, tmp, _ = forward(params, tokens, jnp.int32(0), tmp, cfg,
                                     last_idx)
            new_kv = []
            for (k_all, v_all), (k1, v1) in zip(kv, tmp):
                k_all = jax.lax.dynamic_update_slice(k_all, k1, (slot, 0, 0))
                v_all = jax.lax.dynamic_update_slice(v_all, v1, (slot, 0, 0))
                new_kv.append((k_all, v_all))
            return logits[:, -1, :], new_kv

        return jax.jit(prefill, donate_argnums=(3,))

    def _build_prefill_mesh(self):
        """Mesh prefill: a full-batch scatter forward where only the admitted
        slot's row carries real tokens (other rows' positions sit past n_ctx
        so their KV writes drop). A [1, T] row cannot be split over the data
        axis, so the mesh path trades the 1/n_slots prefill saving for a
        single SPMD program that needs no cross-shard splice."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.sharding import (
            DATA_AXIS, KV_SPEC, MODEL_AXIS, params_pspec_tree,
        )
        local_cfg = dataclasses.replace(
            self.cfg, n_head=self.hp.n_head // self.tp, tp_axis=MODEL_AXIS,
            flash_prefill=True)

        def prefill(params, tokens, row_past, kv, last_idx):
            logits, kv, _ = forward(params, tokens, row_past, kv, local_cfg,
                                    last_idx)
            return logits[:, -1, :], kv

        pspecs = params_pspec_tree(self.params)
        kv_specs = [(KV_SPEC, KV_SPEC)] * self.hp.n_layer
        in_specs = (pspecs, P(DATA_AXIS, None), P(DATA_AXIS), kv_specs, P())
        out_specs = (P(DATA_AXIS, None), kv_specs)
        fn = shard_map(prefill, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return jax.jit(fn, donate_argnums=(3,))

    def _build_decode_paged(self):
        from ..models.llama import forward_paged_decode
        from .paged_kv import paged_attention_reference, paged_attention_tpu
        cfg = self.cfg
        if self.mesh is not None:
            from ..parallel.sharding import MODEL_AXIS
            cfg = dataclasses.replace(
                cfg, n_head=self.hp.n_head // self.tp, tp_axis=MODEL_AXIS)
        top_k_cap = self.top_k
        # Own fused page-gather kernel first (kernels/paged_attention.py —
        # 31 vs 100 us at 7B B=8 len=64, 117 vs 155 at len=448, against the
        # best-tuned library kernel; the library grids per (b, head,
        # page-block) and its per-cell overhead dominated the paged step at
        # 5.44 ms — BASELINE.md round-2 profile). Library kernel as the
        # fallback for shapes the own kernel can't tile (VMEM window,
        # alignment); jnp reference for tiny test models.
        hd = self.hp.head_dim
        h_local = self.hp.n_head // self.tp
        from ..kernels.paged_attention import (
            paged_attn_supported, paged_decode_attention,
        )
        pager = self.pager
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and paged_attn_supported(
                h_local, pager.pages_per_seq, pager.page_size, hd,
                jnp.dtype(pager.dtype).itemsize):
            attn = paged_decode_attention
        elif on_tpu and hd % 128 == 0 and pager.page_size % 8 == 0:
            # whole-sequence compute blocks: ppcb=pages_per_seq measured
            # 198.7 vs 290.3 us (ppcb=4) at length 448 (tools/
            # bench_paged_attn.py sweep over ppcb {1,2,4,8}); short lengths
            # pay ~8% which the long tail of a generation amortizes away.
            # Capped so the kernel's double-buffered K/V VMEM footprint
            # (2*2*ppcb*page_size*hd bytes/head-group) stays ~<=2 MB at
            # large n_ctx instead of scaling linearly with it.
            ppcb_cap = max(1, (1 << 21) // (4 * pager.page_size * hd))

            def attn(q, kp, vp, lengths, tables):
                return paged_attention_tpu(
                    q, kp, vp, lengths, tables,
                    pages_per_compute_block=min(tables.shape[1], ppcb_cap))
        else:
            attn = paged_attention_reference

        dp_axis = None
        if self.mesh is not None and self.dp > 1:
            from ..parallel.sharding import DATA_AXIS
            dp_axis = DATA_AXIS

        def step(params, tokens, lengths, tables, page_ids, offs, active,
                 lastn, temps, topks, topps, rps, key, step_i, kpages, vpages):
            logits, kpages, vpages = forward_paged_decode(
                params, tokens, lengths, tables, kpages, vpages,
                page_ids, offs, cfg, paged_attn=attn)
            step_key = jax.random.fold_in(key, step_i)
            if dp_axis is not None:
                # decorrelate data shards (each samples its own slot rows)
                step_key = jax.random.fold_in(
                    step_key, jax.lax.axis_index(dp_axis).astype(jnp.uint32))
            nxt = sample_jax(logits[:, -1, :], lastn, step_key,
                             top_k=top_k_cap, top_p=topps, temp=temps,
                             repeat_penalty=rps, top_k_v=topks)
            nxt = jnp.where(active, nxt, 0)
            lastn = jnp.where(active[:, None],
                              jnp.concatenate([lastn[:, 1:], nxt[:, None]],
                                              axis=1),
                              lastn)
            tok_out = nxt[:, None]
            if dp_axis is not None:
                # replicate sampled tokens across the data axis (see the
                # slab _decode_core for the multi-host contract)
                tok_out = jax.lax.all_gather(nxt, dp_axis, axis=0,
                                             tiled=True)[:, None]
            return tok_out, lastn, step_i + 1, kpages, vpages

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from ..parallel.sharding import (
                DATA_AXIS, MODEL_AXIS, params_pspec_tree,
            )
            pool = P(MODEL_AXIS, DATA_AXIS, None, None)
            pools = [pool] * self.hp.n_layer
            pd = P(DATA_AXIS)
            pd2 = P(DATA_AXIS, None)
            # slots split over dp (each shard decodes + samples its own rows
            # against its local page-pool partition); tokens out replicated
            in_specs = (params_pspec_tree(self.params), pd2, pd, pd2,
                        pd, pd, pd, pd2, pd, pd, pd, pd, P(), P(),
                        pools, pools)
            out_specs = (P(None, None), pd2, P(), pools, pools)
            step = shard_map(step, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
        # NO decode compiler options here: suppressing MSA prefetch around
        # the paged-attention + in-place kv_write custom calls measured a
        # 27x device-step collapse (400 vs 15 ms/step, 7B B=8) — the paged
        # kernels' aliased pools rely on MSA-scheduled copies. Slab keeps
        # the flags (utils/xla_opts.py); see BASELINE.md.
        return jax.jit(step, donate_argnums=(14, 15))

    def _build_prefill_paged(self):
        from ..models.llama import forward_paged_prefill
        cfg = dataclasses.replace(self.cfg, flash_prefill=True)
        if self.mesh is not None:
            from ..parallel.sharding import MODEL_AXIS
            cfg = dataclasses.replace(
                cfg, n_head=self.hp.n_head // self.tp, tp_axis=MODEL_AXIS)

        if self.mesh is None:
            def prefill(params, tokens, last_idx, page_ids, offs,
                        kpages, vpages):
                return forward_paged_prefill(params, tokens, last_idx,
                                             page_ids, offs, kpages, vpages,
                                             cfg)
            return jax.jit(prefill, donate_argnums=(5, 6))

        # Mesh prefill: the [1, T] prompt row is replicated over dp (it
        # cannot split over the data axis); every shard computes the same
        # activations, but the page_ids/offs arrays arrive PER SHARD
        # ([dp, T] split over dp) — the admitted slot's owner shard carries
        # real local ids, the others the trash sentinel, so only the owner's
        # pool partition receives the prompt's K/V.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.sharding import DATA_AXIS, MODEL_AXIS, params_pspec_tree

        def prefill(params, tokens, last_idx, page_ids, offs, kpages, vpages):
            return forward_paged_prefill(params, tokens, last_idx,
                                         page_ids[0], offs[0],
                                         kpages, vpages, cfg)

        pool = P(MODEL_AXIS, DATA_AXIS, None, None)
        pools = [pool] * self.hp.n_layer
        in_specs = (params_pspec_tree(self.params), P(None, None), P(),
                    P(DATA_AXIS, None), P(DATA_AXIS, None), pools, pools)
        out_specs = (P(None, None), pools, pools)
        prefill = shard_map(prefill, mesh=self.mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
        return jax.jit(prefill, donate_argnums=(5, 6))

    def _build_ingest_chunk(self):
        """One n_batch-wide ingest step over the private [1, n_ctx] row
        cache. kv_update='scatter' (positions [1, T]); attention is the
        masked einsum over rows <= position — partitioning the QUERY rows
        into chunks leaves each row's math identical to the monolithic
        prefill, so chunked and monolithic admissions produce the same
        logits (exactly in f32; tested)."""
        cfg = self.cfg

        def chunk(params, tokens, n_past, kv1, last_idx):
            logits, kv1, _ = forward(params, tokens, n_past, kv1, cfg,
                                     last_idx)
            return logits[:, -1, :], kv1

        return jax.jit(chunk, donate_argnums=(3,))

    def _build_splice(self):
        """Copy the admission row cache into the slot's slab row (the same
        dynamic_update_slice splice the monolithic prefill does in-jit)."""
        def splice(kv, kv1, slot):
            out = []
            for (k_all, v_all), (k1, v1) in zip(kv, kv1):
                out.append((
                    jax.lax.dynamic_update_slice(k_all, k1, (slot, 0, 0)),
                    jax.lax.dynamic_update_slice(v_all, v1, (slot, 0, 0))))
            return out

        return jax.jit(splice, donate_argnums=(0,))

    def _build_splice_paged(self):
        """Write the admission row cache's rows into the slot's pages.

        On TPU: the bulk whole-page kernel (kernels/kv_write.
        paged_kv_write_rows — the XLA flat-view scatter materialized
        defensive copies of every pool, ~1.76 s for one 512-row splice at
        7B). Elsewhere/unsupported shapes: the scatter. Padded tail blocks
        carry the sentinel page id and land in the trash page."""
        from .paged_kv import write_tokens_paged
        from ..kernels.kv_write import (
            paged_kv_write_rows, paged_kv_write_rows_supported,
        )
        h, hd = self.hp.n_head, self.hp.head_dim
        ps = self.pager.page_size
        on_tpu = jax.default_backend() == "tpu"

        def splice(kpages, vpages, kv1, pages, offs):
            t = pages.shape[1]
            out_k, out_v = [], []
            if on_tpu and paged_kv_write_rows_supported(t, ps, hd):
                block_pages = pages[0, ::ps]
                for (kp, vp), (k1, v1) in zip(zip(kpages, vpages), kv1):
                    kp, vp = paged_kv_write_rows(kp, vp, k1[0, :t],
                                                 v1[0, :t], block_pages)
                    out_k.append(kp)
                    out_v.append(vp)
                return out_k, out_v
            for (kp, vp), (k1, v1) in zip(zip(kpages, vpages), kv1):
                k = k1[:, :t].reshape(1, t, h, hd)
                v = v1[:, :t].reshape(1, t, h, hd)
                kp, vp = write_tokens_paged(kp, vp, k, v, pages, offs)
                out_k.append(kp)
                out_v.append(vp)
            return out_k, out_v

        return jax.jit(splice, donate_argnums=(0, 1))

    def _start_admission(self, slot_idx: int, req: Request) -> bool:
        ids = self._tokenize_guard(req)
        if ids is None:
            return False
        self._setup_slot(slot_idx, req, ids)
        self._adm = _Admission(slot_idx=slot_idx, req=req, ids=ids)
        return True

    def _advance_admission(self) -> None:
        """Run ONE prompt chunk; on the final chunk, splice the row cache
        into the slab and activate the slot."""
        adm = self._adm
        nb = self._adm_chunk
        t = len(adm.ids)
        r = min(nb, t - adm.n_done)
        toks = np.zeros((1, nb), np.int32)
        toks[0, :r] = adm.ids[adm.n_done:adm.n_done + r]
        adm.last_logits, self._adm_kv = self._chunk_fn(
            self.params, jnp.asarray(toks), jnp.int32(adm.n_done),
            self._adm_kv, jnp.int32(r - 1))
        adm.n_done += r
        if adm.n_done >= t:
            if self.pager is not None:
                si = adm.slot_idx
                if not self.pager.alloc_for(si, t):
                    self.slots[si].req = None
                    adm.req.done = True
                    self.logger.log_err(
                        "BatchEngine",
                        f"request {adm.req.rid}: out of KV pages\n")
                    self._adm = None
                    return
                # pad to the rows actually written (the final chunk's
                # padded tail): sentinel ids drop those rows
                t_pad = adm.n_done
                pages = np.full((1, t_pad), self.pager.sentinel, np.int32)
                offs = np.zeros((1, t_pad), np.int32)
                pages[0, :t], offs[0, :t] = \
                    self.pager.token_page_offsets(si, 0, t)
                self.pager.k_pages, self.pager.v_pages = self._splice_fn(
                    self.pager.k_pages, self.pager.v_pages, self._adm_kv,
                    jnp.asarray(pages), jnp.asarray(offs))
                self.pager.lengths[si] = t
            else:
                self.kv = self._splice_fn(self.kv, self._adm_kv,
                                          adm.slot_idx)
            self._activate_slot(adm.slot_idx, adm.req, adm.last_logits, t)
            self._adm = None

    # -- request lifecycle ---------------------------------------------------

    def submit(self, req: Request) -> Request:
        req.rid = self._next_rid
        self._next_rid += 1
        self.pending.put(req)
        return req

    def _req_sampling(self, req: Request) -> tuple[float, int, float, float]:
        temp = self.temp if req.temp is None else req.temp
        topk = self.top_k if req.top_k is None else req.top_k
        topk = max(1, min(topk if topk > 0 else self.top_k, self.top_k))
        topp = self.top_p if req.top_p is None else req.top_p
        rp = self.repeat_penalty if req.repeat_penalty is None \
            else req.repeat_penalty
        return temp, topk, topp, rp

    def _tokenize_guard(self, req: Request) -> Optional[list[int]]:
        ids = tokenize(self.vocab, " " + req.prompt, bos=True)
        if len(ids) > self.n_ctx - 4:
            req.done = True
            req.text = ""
            self.logger.log_err("BatchEngine",
                                f"request {req.rid} prompt too long\n")
            return None
        return ids

    def _setup_slot(self, slot_idx: int, req: Request, ids: list[int]) -> None:
        slot = self.slots[slot_idx]
        slot.req = req
        slot.live = False
        slot.n_past = 0
        slot.generated = 0
        slot.stop_bytes = [w.encode() for w in req.stop_words]
        max_buf = max((len(tokenize(self.vocab, w, bos=False))
                       for w in req.stop_words), default=0)

        def emit(s, _req=req):
            _req.text += s
            if _req.streaming_fn:
                _req.streaming_fn(s)

        slot.buffer = TokenBuffer(self.vocab, max_buf, emit)
        req.slot = slot_idx
        req.n_prompt = len(ids)

    def _activate_slot(self, slot_idx: int, req: Request,
                       logits_for_slot: jax.Array, t: int) -> None:
        """Shared admission tail: fresh per-slot sampling state, the first
        token sampled ON DEVICE (zero host round-trips), device slot state
        armed, and the first-token drain entry queued."""
        slot = self.slots[slot_idx]
        req_temp, req_topk, req_topp, req_rp = self._req_sampling(req)
        self.d_temps = self.d_temps.at[slot_idx].set(req_temp)
        self.d_topk = self.d_topk.at[slot_idx].set(req_topk)
        self.d_topp = self.d_topp.at[slot_idx].set(req_topp)
        self.d_rp = self.d_rp.at[slot_idx].set(req_rp)
        self.d_lastn = self.d_lastn.at[slot_idx].set(
            jnp.full((self.last_n_size,), -1, jnp.int32))

        first = sample_jax(
            logits_for_slot, self.d_lastn[slot_idx:slot_idx + 1],
            jax.random.fold_in(self._base_key, 100000 + req.rid),
            top_k=self.top_k, top_p=req_topp, temp=req_temp,
            repeat_penalty=req_rp,
            top_k_v=jnp.asarray([req_topk], jnp.int32))[0]

        # host counters start one behind: the first-token drain advances them
        slot.n_past = t - 1
        slot.generated = 0
        slot.live = True

        self.d_tokens = self.d_tokens.at[slot_idx, 0].set(first)
        self.d_npast = self.d_npast.at[slot_idx].set(t)
        self.d_active = self.d_active.at[slot_idx].set(True)
        self.d_lastn = self.d_lastn.at[slot_idx, -1].set(first)
        rids = [-1] * self.n_slots
        rids[slot_idx] = req.rid
        self._inflight.append((self.d_tokens, rids))

    def _admit(self, slot_idx: int, req: Request) -> bool:
        ids = self._tokenize_guard(req)
        if ids is None:
            return False
        self._setup_slot(slot_idx, req, ids)
        slot = self.slots[slot_idx]

        # bucketed prefill (single live row in every mode)
        t = len(ids)
        bucket = next((b for b in self._buckets if b >= t), self.n_ctx)
        if self.pager is not None:
            toks = np.zeros((1, bucket), np.int32)
            toks[0, :t] = ids
            # fresh slot: prompt-local attention + page writes
            if not self.pager.alloc_for(slot_idx, t):
                slot.req = None
                req.done = True
                self.logger.log_err("BatchEngine",
                                    f"request {req.rid}: out of KV pages\n")
                return False
            sent = self.pager.sentinel
            if self.mesh is not None:
                # per-dp-shard write locations: only the owner shard's row
                # carries real (local) page ids, the rest hit their trash
                pages = np.full((self.dp, bucket), sent, np.int32)
                offs = np.zeros((self.dp, bucket), np.int32)
                g = self.pager.group_of(slot_idx)
                pages[g, :t], offs[g, :t] = \
                    self.pager.token_page_offsets(slot_idx, 0, t)
            else:
                pages = np.full(bucket, sent, np.int32)
                offs = np.zeros(bucket, np.int32)
                pages[:t], offs[:t] = \
                    self.pager.token_page_offsets(slot_idx, 0, t)
            logits_for_slot, self.pager.k_pages, self.pager.v_pages = \
                self._prefill_fn(self.params, jnp.asarray(toks),
                                 jnp.int32(t - 1), jnp.asarray(pages),
                                 jnp.asarray(offs), self.pager.k_pages,
                                 self.pager.v_pages)
            self.pager.lengths[slot_idx] = t
        elif self.mesh is not None:
            toks = np.zeros((self.n_slots, bucket), np.int32)
            toks[slot_idx, :t] = ids
            row_past = np.full((self.n_slots,), self.n_ctx + 1, np.int32)
            row_past[slot_idx] = 0
            all_logits, self.kv = self._prefill_fn(
                self.params, jnp.asarray(toks), jnp.asarray(row_past),
                self.kv, jnp.int32(t - 1))
            logits_for_slot = all_logits[slot_idx:slot_idx + 1]
        else:
            toks = np.zeros((1, bucket), np.int32)
            toks[0, :t] = ids
            logits_for_slot, self.kv = self._prefill_fn(
                self.params, jnp.asarray(toks), jnp.int32(slot_idx), self.kv,
                jnp.int32(t - 1))

        self._activate_slot(slot_idx, req, logits_for_slot, t)
        return True

    def _emit_token(self, slot: _Slot, token: int) -> None:
        req = slot.req
        if token == EOS_ID:
            slot.buffer.flush_all()
            self._finish(slot)
            return
        req.tokens_out.append(token)
        slot.buffer.add(token)
        found, before, after = slot.buffer.scan_stop_words(slot.stop_bytes)
        if found:
            if before:
                req.text += before.decode("utf-8", "replace")
                if req.streaming_fn:
                    req.streaming_fn(before.decode("utf-8", "replace"))
            self._finish(slot)
            return
        # the context guard reserves the max drain lag (2*depth banked steps
        # + the one being launched): steps launched before the host notices
        # the stop must still write KV in bounds
        if slot.generated >= req.max_tokens or \
                slot.n_past >= self.n_ctx - 2 - 2 * self.drain_depth:
            slot.buffer.flush_all()
            self._finish(slot)

    def _finish(self, slot: _Slot) -> None:
        idx = self.slots.index(slot)
        slot.req.done = True
        slot.req = None
        slot.live = False
        self.d_active = self.d_active.at[idx].set(False)
        if self.pager is not None:
            self.pager.free_slot(idx)

    # -- main loop -----------------------------------------------------------

    def _fill_idle_slots(self) -> None:
        if self.chunked_admission:
            # one admission in flight at a time, advanced one chunk per
            # engine step; decode keeps running for the active slots
            if self._adm is None and not self.pending.empty():
                for i, slot in enumerate(self.slots):
                    if slot.req is None:
                        try:
                            req = self.pending.get_nowait()
                        except queue.Empty:
                            break
                        if self._start_admission(i, req):
                            break
            if self._adm is not None:
                self._advance_admission()
            return
        for i, slot in enumerate(self.slots):
            if slot.req is None and not self.pending.empty():
                try:
                    req = self.pending.get_nowait()
                except queue.Empty:
                    break
                self._admit(i, req)

    def _launch(self) -> None:
        """Dispatch one batched decode step (returns without blocking)."""
        if self.pager is not None:
            sentinel = self.pager.sentinel
            pages = np.full(self.n_slots, sentinel, np.int32)
            offs = np.zeros(self.n_slots, np.int32)
            lengths = np.zeros(self.n_slots, np.int32)
            for i, slot in enumerate(self.slots):
                if slot.req is None or not slot.live:
                    continue
                ln = int(self.pager.lengths[i])
                if not self.pager.alloc_for(i, ln + 1):
                    self.logger.log_err(
                        "BatchEngine", f"slot {i}: out of KV pages, "
                        "finishing early\n")
                    slot.buffer.flush_all()
                    self._finish(slot)
                    continue
                p, o = self.pager.token_page_offsets(i, ln, 1)
                pages[i], offs[i] = p[0], o[0]
                lengths[i] = ln
            if not any(s.live for s in self.slots):
                return
            (self.d_tokens, self.d_lastn, self.d_step,
             self.pager.k_pages, self.pager.v_pages) = self._decode_fn(
                self.params, self.d_tokens, jnp.asarray(lengths),
                jnp.asarray(self.pager.page_tables), jnp.asarray(pages),
                jnp.asarray(offs), self.d_active, self.d_lastn, self.d_temps,
                self.d_topk, self.d_topp, self.d_rp,
                self._base_key, self.d_step, self.pager.k_pages,
                self.pager.v_pages)
            for i, slot in enumerate(self.slots):
                if slot.req is not None and slot.live:
                    self.pager.lengths[i] += 1
        else:
            (self.d_tokens, self.d_npast, self.d_lastn, self.d_step,
             self.kv) = self._decode_fn(
                self.params, self.d_tokens, self.d_npast, self.d_active,
                self.d_lastn, self.d_temps, self.d_topk, self.d_topp,
                self.d_rp, self._base_key, self.d_step, self.kv)
        self._inflight.append(
            (self.d_tokens,
             [s.req.rid if s.req is not None and s.live else -1
              for s in self.slots]))

    def _start_drain(self, count: int) -> None:
        """Begin an ASYNC device->host copy of the `count` oldest in-flight
        steps' tokens (one concatenated transfer). The copy crosses the
        tunnel (~27 ms) while the device keeps decoding newer steps; a
        later _consume_drain() turns it into emitted tokens with a
        (by then) near-free np.asarray."""
        entries = [self._inflight.popleft() for _ in range(count)]
        if count == 1:
            arr = entries[0][0]                            # [B, 1]
        else:
            arr = jnp.concatenate([e[0] for e in entries], axis=1)
        try:
            arr.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass                                           # fall back to sync
        self._pending_drain = (arr, entries)

    def _consume_drain(self) -> None:
        if self._pending_drain is None:
            return
        arr, entries = self._pending_drain
        self._pending_drain = None
        self._emit_entries(np.asarray(arr), entries)

    def _drain(self, count: int) -> None:
        """Synchronous drain (idle flush): read back the `count` oldest
        in-flight steps in ONE transfer and emit, oldest first. Entries are
        matched by request id: a slot re-admitted since the launch never
        sees the old occupant's tokens."""
        entries = [self._inflight.popleft() for _ in range(count)]
        if count == 1:
            toks = np.asarray(entries[0][0])               # [B, 1]
        else:
            toks = np.asarray(jnp.concatenate(
                [e[0] for e in entries], axis=1))          # [B, count]
        self._emit_entries(toks, entries)

    def _emit_entries(self, toks: np.ndarray, entries) -> None:
        for j, (_, rids) in enumerate(entries):
            for i, slot in enumerate(self.slots):
                if slot.req is not None and slot.req.rid == rids[i]:
                    slot.n_past += 1
                    slot.generated += 1
                    self._emit_token(slot, int(toks[i, j]))

    def step(self) -> int:
        """One engine iteration: admit pending requests, launch one batched
        decode step, drain once enough steps are banked. Returns the number
        of active slots (host view)."""
        self._fill_idle_slots()
        have_active = any(s.live for s in self.slots)
        if have_active:
            self._launch()
        # hysteresis: let up to 2*depth steps bank; each cycle first lands
        # the PREVIOUS cycle's async transfer (its ~27 ms tunnel crossing
        # overlapped the last `depth` device steps), then starts the next
        # one. Once idle, flush everything synchronously.
        if not any(s.live for s in self.slots):
            self._consume_drain()
            if self._inflight:
                self._drain(len(self._inflight))
        elif len(self._inflight) >= max(2 * self.drain_depth, 1):
            self._consume_drain()
            self._start_drain(max(self.drain_depth, 1))
        return sum(1 for s in self.slots if s.req is not None)

    def run(self, requests: Sequence[Request]) -> list[Request]:
        """Submit requests and run until all complete."""
        from ..utils.trace import trace_region
        for r in requests:
            self.submit(r)
        with trace_region(self.rcfg.profile_dir, "engine_run"):
            while not all(r.done for r in requests):
                self.step()
        self._pending_drain = None
        self._inflight.clear()
        return list(requests)
