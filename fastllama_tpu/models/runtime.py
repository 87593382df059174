"""LlamaModel — the stateful runtime wrapper around the pure forward pass.

The TPU-native counterpart of the reference's `fastllama::Model`
(include/llama.hpp:124-235 / lib/llama.cpp): owns the weights pytree, the KV
cache, and the compiled eval entry points. Where the reference rebuilds a ggml
graph every eval (llama.cpp:292-297), this wrapper traces the forward pass
once per (bucket length, all_logits) pair and reuses the compiled executable
for every subsequent call — prefill lengths are padded up to a bucket to keep
the compile set small.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HyperParams, RuntimeConfig
from ..engine.logger import Logger, NULL_LOGGER
from ..engine.tokenizer import Vocab
from .llama import (
    ForwardConfig, LlamaParams, forward_jit, forward_jit_decode,
    init_kv_cache,
)


class LlamaModel:
    """Single-stream (batch=1) model runtime. The continuous-batching engine
    (engine/scheduler.py) drives the forward pass directly instead."""

    def __init__(self, hp: HyperParams, params: LlamaParams, vocab: Vocab,
                 rcfg: RuntimeConfig = RuntimeConfig(),
                 logger: Logger = NULL_LOGGER):
        self.hp = hp.with_ctx(rcfg.n_ctx)
        self.params = params
        self.vocab = vocab
        self.rcfg = rcfg
        self.logger = logger
        self.is_valid = True

        kv_dtype = jnp.dtype(rcfg.kv_dtype)
        self.kv = init_kv_cache(self.hp, 1, rcfg.n_ctx, kv_dtype)
        self.n_cached = 0    # tokens resident in the cache (state save/load)
        # embeddings tap before any eval: zeros (the reference returns an
        # empty span; a crash would be worse)
        self._embeddings = jnp.zeros((1, hp.n_embd), jnp.float32)

        base = dict(n_head=hp.n_head, n_rot=hp.n_rot,
                    w_dtype=rcfg.weight_dtype, use_pallas=rcfg.use_pallas,
                    prefill_int8=rcfg.prefill_int8)
        # one static config per (all_logits, flash_prefill) combination;
        # flash variants only ever run with n_past == 0 (eval dispatches)
        self._cfg = {
            (al, fl): ForwardConfig(all_logits=al, flash_prefill=fl, **base)
            for al in (False, True) for fl in (False, True)
        }

        self._buckets = sorted({min(b, rcfg.n_ctx)
                                for b in rcfg.prefill_buckets} | {1, rcfg.n_ctx})

        # multi-chip: shard weights/KV over a Mesh and swap in the shard_map
        # forward (rcfg.mesh_shape, e.g. (1, 8) = tp over 8 chips)
        self.mesh = None
        self.sp = 1
        self._sharded_fwd = {}
        if rcfg.mesh_shape and int(np.prod(rcfg.mesh_shape)) > 1:
            from ..parallel.sharding import (
                make_mesh, shard_kv, shard_kv_seq, shard_params,
            )
            n_data, n_model = (rcfg.mesh_shape if len(rcfg.mesh_shape) == 2
                               else (1, rcfg.mesh_shape[0]))
            if n_data != 1 and not rcfg.seq_parallel:
                raise ValueError(
                    "the single-stream LlamaModel is batch=1 and cannot be "
                    "data-parallel; use mesh_shape=(1, tp) here (or set "
                    "rcfg.seq_parallel to shard the SEQUENCE over the data "
                    "axis), or the continuous-batching BatchEngine")
            self.mesh = make_mesh(n_data=n_data, n_model=n_model)
            self.params = shard_params(self.params, self.mesh)
            if n_data != 1:
                # sequence parallelism: cache row == global position,
                # positions sharded over the data axis (parallel/ring.py)
                if rcfg.n_ctx % n_data:
                    raise ValueError(
                        f"n_ctx={rcfg.n_ctx} must be divisible by sp={n_data}")
                self.sp = n_data
                self.kv = shard_kv_seq(self.kv, self.mesh)
            else:
                self.kv = shard_kv(self.kv, self.mesh)
            logger.log("Model",
                       f"sharded over mesh {'sp' if self.sp > 1 else 'dp'}="
                       f"{n_data} tp={n_model}\n")

    # -- eval ---------------------------------------------------------------

    def _bucket(self, t: int, n_past: int) -> int:
        """Smallest bucket >= t whose window still fits the cache; falls back
        to the exact remaining room at the context boundary."""
        room = self.hp.n_ctx - n_past
        for b in self._buckets:
            if b >= t and b <= room:
                return b
        return max(t, 1)

    def eval(self, n_past: int, tokens: Sequence[int],
             all_logits: bool = False) -> np.ndarray:
        """Run the forward pass over `tokens` starting at n_past.

        Returns logits as float32 numpy: [len(tokens), n_vocab] when
        all_logits else [n_vocab] (the last token's row). Mirrors
        Model::eval's output contract (lib/llama.cpp:476-483).
        """
        t = len(tokens)
        if t == 0:
            raise ValueError("eval of empty token list")
        if n_past + t > self.hp.n_ctx:
            raise ValueError(
                f"eval window [{n_past}, {n_past + t}) exceeds n_ctx={self.hp.n_ctx}")

        b = self._bucket(t, n_past)
        if self.sp > 1 and b > 1:
            # prefill windows shard over the sequence axis: T % sp == 0.
            # Padded tail rows land past the real window (causally masked;
            # cache writes past n_ctx drop) and are overwritten by the next
            # chunk's real tokens before anything attends them.
            b = min(-(-b // self.sp) * self.sp, self.hp.n_ctx)
        buf = np.zeros((1, b), np.int32)
        buf[0, :t] = np.asarray(tokens, np.int32)

        cfg = self._cfg[(all_logits, n_past == 0 and t > 1)]
        if self.mesh is not None:
            logits, self.kv, self._embeddings = self._get_sharded(
                cfg, decode=b == 1)(
                self.params, jnp.asarray(buf), jnp.int32(n_past),
                self.kv, jnp.int32(t - 1))
        else:
            # single-token steps take the decode jit (MSA pre-staging
            # suppressed — see utils/xla_opts.py); prefill keeps defaults
            fwd = forward_jit_decode if b == 1 else forward_jit
            logits, self.kv, self._embeddings = fwd(
                self.params, jnp.asarray(buf), jnp.int32(n_past),
                self.kv, cfg, jnp.int32(t - 1))
        self.n_cached = max(self.n_cached, n_past + t)

        out = np.asarray(logits[0])
        return out[:t] if all_logits else out[-1]

    def _get_sharded(self, cfg: ForwardConfig, decode: bool = False):
        """Lazily built+cached shard_map forward per static config."""
        key = (cfg, decode)
        if key not in self._sharded_fwd:
            from ..parallel.sharding import (
                make_seq_parallel_forward, make_sharded_forward,
            )
            if self.sp > 1:
                # chunked=True: ring prefill seeds its online softmax from
                # the cache prefix, so the session's n_batch ingest loop
                # (and recycle re-feeds at n_past == n_keep) just work
                self._sharded_fwd[key] = make_seq_parallel_forward(
                    self.mesh, self.params, cfg, decode=decode, chunked=True)
            else:
                self._sharded_fwd[key] = make_sharded_forward(
                    self.mesh, self.params, cfg)
        return self._sharded_fwd[key]

    def get_embeddings(self) -> np.ndarray:
        """Final-norm hidden state of the last evaluated token
        (reference tap: lib/llama.cpp:455-460)."""
        return np.asarray(self._embeddings[0])

    # -- state --------------------------------------------------------------

    def reset(self) -> bool:
        self.n_cached = 0
        self._embeddings = jnp.zeros((1, self.hp.n_embd), jnp.float32)
        return True

    def kv_state(self) -> dict[str, np.ndarray]:
        """KV-cache snapshot for session save (reference:
        KVCacheBuffer::save_state raw bytes, lib/llama.cpp:57-78 — here only
        the resident prefix is saved, not the whole buffer)."""
        n = self.n_cached
        # float32 on the wire: npz round-trips bfloat16 as opaque void bytes
        kk = np.stack([np.asarray(k[:, :n]) for k, _ in self.kv])
        vv = np.stack([np.asarray(v[:, :n]) for _, v in self.kv])
        return {"kv_k": kk.astype(np.float32), "kv_v": vv.astype(np.float32)}

    def load_kv_state(self, state: dict[str, np.ndarray]) -> None:
        k = state["kv_k"]          # [L, B, n, H, Dh]
        n = k.shape[2]
        if n > self.hp.n_ctx:
            raise ValueError(f"saved KV length {n} exceeds n_ctx={self.hp.n_ctx}")
        kv_dtype = self.kv[0][0].dtype
        shape = self.kv[0][0].shape
        new_kv = []
        for li in range(self.hp.n_layer):
            kk = np.zeros(shape, np.float32)
            vv = np.zeros(shape, np.float32)
            kk[:, :n] = k[li]
            vv[:, :n] = state["kv_v"][li]
            new_kv.append((jnp.asarray(kk, kv_dtype), jnp.asarray(vv, kv_dtype)))
        if self.mesh is not None:
            from ..parallel.sharding import shard_kv, shard_kv_seq
            new_kv = (shard_kv_seq(new_kv, self.mesh) if self.sp > 1
                      else shard_kv(new_kv, self.mesh))
        self.kv = new_kv
        self.n_cached = n

    def set_threads(self, n: int) -> None:
        """No-op parity shim (reference Model::set_threads; XLA owns scheduling)."""
        del n

    # -- LoRA ---------------------------------------------------------------

    def attach_lora(self, path: str) -> bool:
        """Attach a ggla adapter (reference: Model::attach_lora,
        lib/llama.cpp:901-919 via attach_or_detach_lora_helper 697-899).

        Unlike the reference — which rewrites W in place and warns that
        quantized bases lose quality (llama.cpp:840-846) — each adapter is a
        separate additive LoraTerm applied alongside the fused matmuls, so
        attach is lossless and detach restores bit-identical weights in O(1).
        """
        from ..engine.logger import ProgressTag
        from ..io.ggml_reader import MAGIC_GGLA, read_ggml_file
        from .llama import LoraTerm

        if getattr(self, "_lora_path", None):
            self.logger.log_err("attach_lora",
                                "an adapter is already attached; detach first\n")
            return False
        try:
            gg = read_ggml_file(path)
        except (OSError, ValueError) as e:
            self.logger.log_err("attach_lora", f"failed to read '{path}': {e}\n")
            return False
        if gg.magic != MAGIC_GGLA:
            self.logger.log_err("attach_lora", f"'{path}' is not a ggla adapter\n")
            return False
        use_cache = gg.lora_params["use_cache_matrix"]

        # group adapter tensors by base weight name
        groups: dict[str, dict[str, str]] = {}
        for name in gg.tensors:
            if name.endswith(".lora"):
                groups.setdefault(name[:-len(".lora")], {})["delta"] = name
            elif name.endswith(".loraA"):
                groups.setdefault(name[:-len(".loraA")], {})["a"] = name
            elif name.endswith(".loraB"):
                groups.setdefault(name[:-len(".loraB")], {})["b"] = name
            else:
                self.logger.log_err("attach_lora",
                                    f"unrecognized adapter tensor '{name}'\n")
                return False

        import jax.numpy as jnp
        w_dtype = jnp.dtype(self.rcfg.weight_dtype)
        staged: list[tuple[object, str, LoraTerm]] = []
        done = 0
        for base_name, g in groups.items():
            slot = self._lora_slot(base_name)
            if slot is None:
                self.logger.log_err(
                    "attach_lora", f"unknown base tensor '{base_name}' — are "
                    "you sure that this adapter is for this model?\n")
                return False
            holder, attr = slot
            if use_cache:
                if "delta" not in g:
                    self.logger.log_err("attach_lora",
                                        f"missing cached ΔW for '{base_name}'\n")
                    return False
                delta = gg.dense(g["delta"])          # [N, K] numpy orient.
                term = LoraTerm(delta=jnp.asarray(delta.T.astype(w_dtype)))
            else:
                if "a" not in g or "b" not in g:
                    self.logger.log_err("attach_lora",
                                        f"missing A/B pair for '{base_name}'\n")
                    return False
                a = gg.dense(g["a"])                  # [K, r] (pre-scaled A^T)
                b = gg.dense(g["b"])                  # [N, r]
                term = LoraTerm(a=jnp.asarray(a.astype(w_dtype)),
                                b=jnp.asarray(b.T.astype(w_dtype)))
            staged.append((holder, attr, term))
            done += 1
            self.logger.progress(ProgressTag.ATTACH_LORA, done, len(groups))

        for holder, attr, term in staged:
            setattr(holder, attr, term)
        self._lora_path = path
        self._reshard_after_lora_change()
        return True

    def detach_lora(self) -> bool:
        """O(1) detach: drop every LoraTerm (reference re-reads the adapter
        file and subtracts, llama.cpp:921-944)."""
        from ..engine.logger import ProgressTag
        if not getattr(self, "_lora_path", None):
            self.logger.log_err("detach_lora", "no adapter attached\n")
            return False
        self.params.lora_output = None
        for layer in self.params.layers:
            for attr in ("lora_wq", "lora_wk", "lora_wv", "lora_wo",
                         "lora_w1", "lora_w2", "lora_w3"):
                setattr(layer, attr, None)
        self.logger.progress(ProgressTag.DETACH_LORA, 1, 1)
        self._lora_path = None
        self._reshard_after_lora_change()
        return True

    def _reshard_after_lora_change(self) -> None:
        """Attach/detach changes the params tree structure; on a mesh the
        LoRA terms must be device_put with their specs and the shard_map
        forwards rebuilt for the new structure."""
        if self.mesh is None:
            return
        from ..parallel.sharding import shard_params
        self.params = shard_params(self.params, self.mesh)
        self._sharded_fwd.clear()    # rebuilt lazily for the new tree

    @property
    def lora_path(self) -> str | None:
        return getattr(self, "_lora_path", None)

    def _lora_slot(self, ggml_name: str):
        """Map a ggml base-tensor name to (holder, lora_field)."""
        import re
        if ggml_name == "output.weight":
            return self.params, "lora_output"
        m = re.match(
            r"layers\.(\d+)\.(attention\.(wq|wk|wv|wo)|feed_forward\.(w1|w2|w3))"
            r"\.weight$", ggml_name)
        if not m:
            return None
        li = int(m.group(1))
        if li >= len(self.params.layers):
            return None
        attr = "lora_" + (m.group(3) or m.group(4))
        return self.params.layers[li], attr
