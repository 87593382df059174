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

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HyperParams, RuntimeConfig
from ..engine.logger import Logger, NULL_LOGGER
from ..engine.tokenizer import Vocab
from .llama import ForwardConfig, LlamaParams, forward_jit, init_kv_cache


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
        self.kv_k, self.kv_v = init_kv_cache(self.hp, 1, rcfg.n_ctx, kv_dtype)
        self.n_cached = 0    # tokens resident in the cache (state save/load)

        base = dict(n_head=hp.n_head, n_rot=hp.n_rot,
                    w_dtype=rcfg.weight_dtype, use_pallas=rcfg.use_pallas)
        self._cfg_last = ForwardConfig(all_logits=False, **base)
        self._cfg_all = ForwardConfig(all_logits=True, **base)

        self._buckets = sorted({min(b, rcfg.n_ctx)
                                for b in rcfg.prefill_buckets} | {1, rcfg.n_ctx})

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
        buf = np.zeros((1, b), np.int32)
        buf[0, :t] = np.asarray(tokens, np.int32)

        cfg = self._cfg_all if all_logits else self._cfg_last
        logits, self.kv_k, self.kv_v, self._embeddings = forward_jit(
            self.params, jnp.asarray(buf), jnp.int32(n_past),
            self.kv_k, self.kv_v, cfg, jnp.int32(t - 1))
        self.n_cached = max(self.n_cached, n_past + t)

        out = np.asarray(logits[0])
        return out[:t] if all_logits else out[-1]

    def get_embeddings(self) -> np.ndarray:
        """Final-norm hidden state of the last evaluated token
        (reference tap: lib/llama.cpp:455-460)."""
        return np.asarray(self._embeddings[0])

    # -- state --------------------------------------------------------------

    def reset(self) -> bool:
        self.n_cached = 0
        return True

    def kv_state(self) -> dict[str, np.ndarray]:
        """KV-cache snapshot for session save (reference:
        KVCacheBuffer::save_state raw bytes, lib/llama.cpp:57-78 — here only
        the resident prefix is saved, not the whole buffer)."""
        n = self.n_cached
        return {
            "kv_k": np.asarray(self.kv_k[:, :, :n]),
            "kv_v": np.asarray(self.kv_v[:, :, :n]),
        }

    def load_kv_state(self, state: dict[str, np.ndarray]) -> None:
        k = state["kv_k"]
        n = k.shape[2]
        if n > self.hp.n_ctx:
            raise ValueError(f"saved KV length {n} exceeds n_ctx={self.hp.n_ctx}")
        kv_dtype = self.kv_k.dtype
        kk = np.zeros(np.shape(self.kv_k), np.float32)
        vv = np.zeros_like(kk)
        kk[:, :, :n] = k
        vv[:, :, :n] = state["kv_v"]
        self.kv_k = jnp.asarray(kk, kv_dtype)
        self.kv_v = jnp.asarray(vv, kv_dtype)
        self.n_cached = n

    def set_threads(self, n: int) -> None:
        """No-op parity shim (reference Model::set_threads; XLA owns scheduling)."""
        del n
