"""Paged KV cache: virtual memory for the KV cache (north-star subsystem).

The slab cache (models/llama.init_kv_cache) reserves n_ctx slots per slot
up front. The paged cache instead shares a physical page pool across all
sequences — each sequence holds only the pages it actually fills, so many
long-and-short sequences coexist without reserving worst-case memory:

  k_pages / v_pages:  per layer, [H, total_pages, page_size, Dh]
  page_tables:        [n_slots, pages_per_seq] physical page ids (host+device)
  lengths:            [n_slots] tokens resident per slot

Decode attention over the paged pool uses JAX's production Pallas kernel
(jax.experimental.pallas.ops.tpu.paged_attention: per-page async DMA with
double buffering and online softmax) on TPU, and a gather-based jnp
reference elsewhere (and in tests).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HyperParams


def paged_attention_reference(q, k_pages, v_pages, lengths, page_indices):
    """jnp reference: gather each sequence's pages and run masked attention.

    q: [B, H, D]; k_pages/v_pages: [H, P, ps, D]; lengths: [B];
    page_indices: [B, pages_per_seq]. Returns [B, H, D] f32.
    """
    b, h, d = q.shape
    ps = k_pages.shape[2]
    pages_per_seq = page_indices.shape[1]
    s_max = pages_per_seq * ps

    # gather: [B, H, pages_per_seq, ps, D] -> [B, H, S, D]
    keys = jnp.take(k_pages, page_indices, axis=1)      # [H, B, pp, ps, D]
    vals = jnp.take(v_pages, page_indices, axis=1)
    keys = jnp.moveaxis(keys, 1, 0).reshape(b, h, s_max, d).astype(jnp.float32)
    vals = jnp.moveaxis(vals, 1, 0).reshape(b, h, s_max, d).astype(jnp.float32)

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    scores = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), keys,
                        precision=jax.lax.Precision.HIGHEST) * scale
    mask = jnp.arange(s_max)[None, None, :] < lengths[:, None, None]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", probs, vals,
                      precision=jax.lax.Precision.HIGHEST)


def paged_attention_tpu(q, k_pages, v_pages, lengths, page_indices,
                        pages_per_compute_block: int = 4):
    """JAX's Pallas paged-attention kernel (TPU only)."""
    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention as pa,
    )
    fn = pa.paged_attention if hasattr(pa, "paged_attention") else pa
    # the library kernel applies no softmax scale; pre-scale q
    d = q.shape[-1]
    q_scaled = q * (1.0 / np.sqrt(d))
    return fn(q_scaled, k_pages, v_pages, lengths, page_indices,
              pages_per_compute_block=pages_per_compute_block)


def write_tokens_paged(k_pages, v_pages, k_new, v_new, page_ids, offsets):
    """Scatter new K/V vectors into their pages.

    k_new/v_new: [B, T, H, D]; page_ids/offsets: [B, T] physical page id and
    in-page offset per written token (precomputed by the manager; entries
    with page_id >= total_pages are dropped — inactive slots/padding).

    The pool is viewed flat ([H, P*ps, D]) so the update scatters on a
    single index dimension — a two-dim (page, offset) scatter lowered ~14
    ms/step slower on v5e.
    """
    h, p, ps, d = k_pages.shape
    b, t = page_ids.shape
    pid = page_ids.reshape(-1)
    off = offsets.reshape(-1)
    # out-of-range page ids must stay out of range after flattening
    flat = jnp.where(pid < p, pid * ps + off, p * ps)
    kv_k = k_new.reshape(b * t, h, -1).swapaxes(0, 1).astype(k_pages.dtype)
    kv_v = v_new.reshape(b * t, h, -1).swapaxes(0, 1).astype(v_pages.dtype)
    k_pages = (k_pages.reshape(h, p * ps, d)
               .at[:, flat, :].set(kv_k, mode="drop").reshape(h, p, ps, d))
    v_pages = (v_pages.reshape(h, p * ps, d)
               .at[:, flat, :].set(kv_v, mode="drop").reshape(h, p, ps, d))
    return k_pages, v_pages


@dataclasses.dataclass
class PagedKVManager:
    """Host-side page allocator + device page pools (per layer).

    dp > 1 partitions the page-id space over the engine's data-parallel
    shards: slot s belongs to dp group ``s // (n_slots/dp)``, allocates only
    from that group's partition, and every id the manager hands out is
    SHARD-LOCAL (so page tables split over the data axis index directly
    into each shard's local slice of the pool — no id translation inside
    the compiled step). Each group gets its own trash page, so the pool's
    page dim is ``dp * (total_pages/dp + 1)`` and shards cleanly as
    P(..., DATA_AXIS, ...). dp=1 reduces to the flat global layout.
    """
    hp: HyperParams
    n_slots: int
    page_size: int
    total_pages: int
    pages_per_seq: int
    dtype: object = jnp.bfloat16
    dp: int = 1

    def __post_init__(self):
        h, d = self.hp.n_head, self.hp.head_dim
        if self.total_pages % self.dp or self.n_slots % self.dp:
            raise ValueError(
                f"total_pages={self.total_pages} and n_slots={self.n_slots} "
                f"must divide dp={self.dp}")
        # pages usable per dp group; also the LOCAL trash-page index: the
        # sentinel id for inactive slots. The Pallas in-place write kernel
        # (kernels/kv_write.py) lands sentinel writes there instead of
        # needing a predicated store; the XLA fallback scatter reaches it
        # the same way. It is never allocated and never in a page table.
        self.local_pages = self.total_pages // self.dp
        shape = (h, self.dp * (self.local_pages + 1), self.page_size, d)
        self.k_pages = [jnp.zeros(shape, self.dtype)
                        for _ in range(self.hp.n_layer)]
        self.v_pages = [jnp.zeros(shape, self.dtype)
                        for _ in range(self.hp.n_layer)]
        self._free = [list(range(self.local_pages - 1, -1, -1))
                      for _ in range(self.dp)]
        # page table per slot, in local ids (writes to the sentinel land in
        # the group's trash page; unset entries read page-0 garbage but are
        # length-masked)
        self.page_tables = np.full((self.n_slots, self.pages_per_seq),
                                   0, np.int32)
        self._owned: list[list[int]] = [[] for _ in range(self.n_slots)]
        self.lengths = np.zeros(self.n_slots, np.int32)

    @property
    def sentinel(self) -> int:
        """The trash-page id (local to every dp group)."""
        return self.local_pages

    def group_of(self, slot: int) -> int:
        return slot // (self.n_slots // self.dp)

    @property
    def free_pages(self) -> int:
        return sum(len(f) for f in self._free)

    def alloc_for(self, slot: int, new_len: int) -> bool:
        """Ensure slot has pages covering new_len tokens. Atomic: on OOM
        nothing is allocated and False is returned. Pages come from the
        slot's dp group partition only (slots are pinned to their shard)."""
        need = -(-new_len // self.page_size)
        if need > self.pages_per_seq:
            return False
        free = self._free[self.group_of(slot)]
        have = len(self._owned[slot])
        if need - have > len(free):
            return False
        while have < need:
            pid = free.pop()
            self.page_tables[slot, have] = pid
            self._owned[slot].append(pid)
            have += 1
        return True

    def free_slot(self, slot: int) -> None:
        self._free[self.group_of(slot)].extend(reversed(self._owned[slot]))
        self._owned[slot] = []
        self.page_tables[slot, :] = 0
        self.lengths[slot] = 0

    def token_page_offsets(self, slot: int, start: int, count: int):
        """(page_ids, offsets) arrays [count] for tokens [start, start+count).
        Caller must have alloc_for'ed through start+count."""
        pos = np.arange(start, start + count)
        logical = pos // self.page_size
        page_ids = self.page_tables[slot, logical]
        offsets = (pos % self.page_size).astype(np.int32)
        return page_ids.astype(np.int32), offsets
