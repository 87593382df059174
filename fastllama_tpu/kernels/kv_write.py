"""In-place paged-KV token write: a Pallas kernel with input/output aliasing.

The decode hot loop writes one token's K/V vectors into each sequence's
current page. Round 1 did this with an XLA scatter over a flat view of the
page pool (engine/paged_kv.write_tokens_paged) — profiled at ~14 ms/step of
defensive `copy` ops at 7B B=8: the reshape between the pool's native
[H, P, ps, D] tiled layout and the flat scatter view, plus the layout
boundary into the paged-attention custom call, forced XLA to materialize
fresh copies of every 128 MB pool every step.

This kernel keeps the pool in its native layout and updates it IN PLACE:

  * operands: (page_ids, offsets | k_new, v_new, k_pages, v_pages) with
    ``input_output_aliases={4: 0, 5: 1}`` — the pools are donated and the
    kernel's outputs are the same HBM buffers; untouched pages are never
    read, copied, or written.
  * grid (B,): each step owns one sequence's write. The BlockSpec index map
    reads the target page id / row group from the scalar-prefetched
    page_ids/offsets (the same mechanism the paged-attention kernel uses
    for its page tables), so only ONE [H, 8, D] row group per pool crosses
    HBM<->VMEM per sequence (~64 KB), not the whole pool.
  * inactive slots carry the sentinel page id `total_pages`; the pool is
    allocated with one extra trash page at that index (PagedKVManager), so
    sentinel writes land harmlessly instead of needing a predicated store.
    Several grid steps may hit the trash page — the grid is declared
    "arbitrary" (sequential), so those collisions are benign.

The reference counterpart is the strided KV-cache view copy in
Model::eval (/root/reference/lib/llama.cpp:336-343); the paging itself has
no reference analog (SURVEY §2.3 new build).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kv_write_kernel(pid_ref, off_ref, knew_ref, vnew_ref, kin_ref, vin_ref,
                     kout_ref, vout_ref, *, ps_blk):
    b = pl.program_id(0)
    r = off_ref[b] % ps_blk
    # blend the new row into its 8-row group: [H, ps_blk, D]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, ps_blk, 1), 1) == r
    kout_ref[:, 0] = jnp.where(sel, knew_ref[0][:, None, :].astype(kout_ref.dtype),
                               kin_ref[:, 0])
    vout_ref[:, 0] = jnp.where(sel, vnew_ref[0][:, None, :].astype(vout_ref.dtype),
                               vin_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_write(k_pages: jax.Array, v_pages: jax.Array,
                   k_new: jax.Array, v_new: jax.Array,
                   page_ids: jax.Array, offsets: jax.Array,
                   interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Write one token per sequence into the page pools, in place.

    Args:
      k_pages/v_pages: [H, P, ps, D] pools (donated; P includes the trash
        page that absorbs sentinel writes — see PagedKVManager).
      k_new/v_new: [B, H, D] the new token's per-head vectors.
      page_ids/offsets: [B] int32 physical page id / in-page row. Inactive
        slots pass the trash page's id.
    Returns the updated (k_pages, v_pages) — the same buffers.
    """
    h, p, ps, d = k_pages.shape
    b = k_new.shape[0]
    ps_blk = 8 if ps % 8 == 0 else ps
    page_ids = jnp.asarray(page_ids, jnp.int32).reshape(b)
    offsets = jnp.asarray(offsets, jnp.int32).reshape(b)

    pool_spec = pl.BlockSpec(
        (h, 1, ps_blk, d),
        lambda bi, pid, off: (0, pid[bi], off[bi] // ps_blk, 0))
    new_spec = pl.BlockSpec((1, h, d), lambda bi, pid, off: (bi, 0, 0))

    kernel = functools.partial(_kv_write_kernel, ps_blk=ps_blk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[new_spec, new_spec, pool_spec, pool_spec],
            out_specs=[pool_spec, pool_spec],
            grid=(b,),
        ),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        # operands: pid(0) off(1) k_new(2) v_new(3) k_pages(4) v_pages(5)
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(page_ids, offsets, k_new, v_new, k_pages, v_pages)


def paged_kv_write_supported(ps: int, d: int) -> bool:
    """Mosaic shape gate: lane-aligned head dim; 8-row-groupable pages."""
    return d % 128 == 0 and (ps % 8 == 0 or ps < 8)


def _kv_write_rows_kernel(pid_ref, krows_ref, vrows_ref, kin_ref, vin_ref,
                          kout_ref, vout_ref, *, h, d):
    del pid_ref, kin_ref, vin_ref
    ps = krows_ref.shape[0]
    k = krows_ref[:].reshape(ps, h, d).swapaxes(0, 1)   # [H, ps, D]
    v = vrows_ref[:].reshape(ps, h, d).swapaxes(0, 1)
    kout_ref[:, 0] = k.astype(kout_ref.dtype)
    vout_ref[:, 0] = v.astype(vout_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_write_rows(k_pages: jax.Array, v_pages: jax.Array,
                        k_rows: jax.Array, v_rows: jax.Array,
                        page_ids: jax.Array,
                        interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Bulk admission write: T consecutive rows -> whole pages, in place.

    The chunked-admission activation scatters a finished prompt's rows
    into the slot's pages; the XLA flat-view scatter materialized
    defensive copies of every pool (measured ~1.76 s for one 512-row
    splice at 7B — the round-1 single-token pathology at bulk scale).
    Here grid step j copies row block [j*ps, (j+1)*ps) of the flat
    [T, H*D] rows into page page_ids[j] with a single in-VMEM head-major
    transpose; pools are donated and aliased, untouched pages never move.
    Rows are position 0..T-1 of a fresh sequence, so every target page is
    written WHOLE (no offset blending); sentinel ids drop padded tails.

    Args:
      k_pages/v_pages: [H, P, ps, D] pools (donated; P includes the trash
        page absorbing sentinel writes).
      k_rows/v_rows: [T, H*D] flat rows, T a multiple of ps.
      page_ids: [T // ps] int32 physical page per row block.
    """
    h, p, ps, d = k_pages.shape
    t = k_rows.shape[0]
    assert t % ps == 0, (t, ps)
    page_ids = jnp.asarray(page_ids, jnp.int32).reshape(t // ps)

    rows_spec = pl.BlockSpec((ps, h * d), lambda j, pid: (j, 0))
    pool_spec = pl.BlockSpec((h, 1, ps, d), lambda j, pid: (0, pid[j], 0, 0))
    kernel = functools.partial(_kv_write_rows_kernel, h=h, d=d)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[rows_spec, rows_spec, pool_spec, pool_spec],
            out_specs=[pool_spec, pool_spec],
            grid=(t // ps,),
        ),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        # operands: pid(0) k_rows(1) v_rows(2) k_pages(3) v_pages(4)
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(page_ids, k_rows, v_rows, k_pages, v_pages)


def paged_kv_write_rows_supported(t_pad: int, ps: int, d: int) -> bool:
    return d % 128 == 0 and ps % 8 == 0 and t_pad % ps == 0 and t_pad >= ps
