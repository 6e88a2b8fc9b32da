"""Pallas TPU kernel: in-place paged KV writes.

Replaces the XLA scatter for cache updates (reference copy_to_rag_buffer2,
src/kvcache/ragged_buffer_kernel.cu). The XLA scatter lowering prefers a
non-default layout for the cache operand while the Pallas attention kernel's
custom-call requires the default layout — XLA reconciles with two full-cache
layout-conversion copies per layer per step (~29 ms/step for a 40-layer
model). This kernel performs the update as HBM->HBM row DMAs with
input_output aliasing, so the cache stays in the default layout end to end
and the update is truly in place.

Two shapes of work:
  * decode: one row per slot (token), ``T`` small — per-row DMAs, unrolled.
  * prefill: rows fill pages contiguously (chunks start page-aligned —
    chunked prefill advances in chunk_size multiples and prefix-cache hits
    are page-granular) — one DMA per fully-covered page + per-row DMAs for
    the partial tail page.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dedup import dedup_jit

__all__ = [
    "paged_write_rows",
    "write_rows_2d",
    "write_rows_2d_pair",
    "write_rows_hm",
    "flush_side_rows_hm",
    "flush_side_rows_2d",
]


def _decode_kernel(slots_ref, rows_k, rows_v, k_in, v_in, k_out, v_out, sems, *, T):
    """Per-row DMAs, rows staged in VMEM: Mosaic rejects dynamic-offset
    HBM->HBM copies (compiler crash, probed on v5e), but dynamic offsets are
    fine when the source is VMEM. k_in/v_in are aliased to k_out/v_out."""
    del k_in, v_in
    for t in range(T):
        slot = slots_ref[t]

        @pl.when(slot >= 0)
        def _():
            pltpu.make_async_copy(rows_k.at[t], k_out.at[slot], sems.at[t, 0]).start()
            pltpu.make_async_copy(rows_v.at[t], v_out.at[slot], sems.at[t, 1]).start()

    for t in range(T):
        slot = slots_ref[t]

        @pl.when(slot >= 0)
        def _():
            pltpu.make_async_copy(rows_k.at[t], k_out.at[slot], sems.at[t, 0]).wait()
            pltpu.make_async_copy(rows_v.at[t], v_out.at[slot], sems.at[t, 1]).wait()


def _prefill_kernel(
    slots_ref, rows_k, rows_v, k_in, v_in, k_out, v_out, bufk, bufv, sems, row_sems, *, T, S
):
    """Page-run writes staged through VMEM double buffers (dynamic-offset
    HBM->HBM DMAs crash Mosaic): rows(HBM, static page offset) -> VMEM ->
    cache(HBM, dynamic offset). Partially-valid pages write their valid rows
    individually from VMEM (row DMAs are tile-aligned on this path)."""
    del k_in, v_in
    n_pages = T // S

    def first(i):
        return slots_ref[i * S]

    def valid(i):
        return first(i) >= 0

    def full(i):
        return jnp.logical_and(valid(i), slots_ref[i * S + S - 1] >= 0)

    def start_read(i, slot):
        pltpu.make_async_copy(rows_k.at[pl.ds(i * S, S)], bufk.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(rows_v.at[pl.ds(i * S, S)], bufv.at[slot], sems.at[slot, 1]).start()

    @pl.when(valid(0))
    def _():
        start_read(0, 0)

    for i in range(n_pages):
        slot = i % 2
        nxt = (i + 1) % 2
        if i + 1 < n_pages:
            @pl.when(valid(i + 1))
            def _():
                start_read(i + 1, nxt)

        @pl.when(valid(i))
        def _():
            pltpu.make_async_copy(
                rows_k.at[pl.ds(i * S, S)], bufk.at[slot], sems.at[slot, 0]
            ).wait()
            pltpu.make_async_copy(
                rows_v.at[pl.ds(i * S, S)], bufv.at[slot], sems.at[slot, 1]
            ).wait()
            dst = first(i)

            @pl.when(full(i))
            def _():
                pltpu.make_async_copy(
                    bufk.at[slot], k_out.at[pl.ds(dst, S)], sems.at[slot, 0]
                ).start()
                pltpu.make_async_copy(
                    bufv.at[slot], v_out.at[pl.ds(dst, S)], sems.at[slot, 1]
                ).start()
                pltpu.make_async_copy(
                    bufk.at[slot], k_out.at[pl.ds(dst, S)], sems.at[slot, 0]
                ).wait()
                pltpu.make_async_copy(
                    bufv.at[slot], v_out.at[pl.ds(dst, S)], sems.at[slot, 1]
                ).wait()

            @pl.when(jnp.logical_not(full(i)))
            def _():
                # partial page: per-row writes of the valid prefix
                for j in range(S):
                    @pl.when(slots_ref[i * S + j] >= 0)
                    def _():
                        s = slots_ref[i * S + j]
                        pltpu.make_async_copy(bufk.at[slot, j], k_out.at[s], row_sems.at[j, 0]).start()
                        pltpu.make_async_copy(bufv.at[slot, j], v_out.at[s], row_sems.at[j, 1]).start()
                for j in range(S):
                    @pl.when(slots_ref[i * S + j] >= 0)
                    def _():
                        s = slots_ref[i * S + j]
                        pltpu.make_async_copy(bufk.at[slot, j], k_out.at[s], row_sems.at[j, 0]).wait()
                        pltpu.make_async_copy(bufv.at[slot, j], v_out.at[s], row_sems.at[j, 1]).wait()


@dedup_jit(5)
def paged_write_rows(
    k_cache: jax.Array,  # [N_slots, H, D] (or [N_slots, L] for MLA latent)
    v_cache: jax.Array,
    k_rows: jax.Array,  # [T, H, D] / [T, L]
    v_rows: jax.Array,
    slot_mapping: jax.Array,  # [T] int32; <0 => skip
    page_size: int,
    interpret: bool = False,
):
    """In-place row writes into the paged pools; returns (k_cache, v_cache)."""
    T = k_rows.shape[0]
    S = page_size
    k_rows = k_rows.astype(k_cache.dtype)
    v_rows = v_rows.astype(v_cache.dtype)

    HBM = pltpu.MemorySpace.HBM
    H, D = k_rows.shape[1], k_rows.shape[2]
    if T >= 2 * S and T % S == 0:
        kernel = functools.partial(_prefill_kernel, T=T, S=S)
        rows_space = HBM
        scratch = [
            pltpu.VMEM((2, S, H, D), k_cache.dtype),
            pltpu.VMEM((2, S, H, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((S, 2)),
        ]
    else:
        kernel = functools.partial(_decode_kernel, T=T)
        rows_space = pltpu.VMEM  # dynamic-offset writes need a VMEM source
        scratch = [pltpu.SemaphoreType.DMA((T, 2))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=rows_space),  # k rows
            pl.BlockSpec(memory_space=rows_space),  # v rows
            pl.BlockSpec(memory_space=HBM),  # k cache (aliased)
            pl.BlockSpec(memory_space=HBM),  # v cache (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=HBM),
            pl.BlockSpec(memory_space=HBM),
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # operand indices include the scalar-prefetch arg: slots=0, k_rows=1,
        # v_rows=2, k_cache=3, v_cache=4
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slot_mapping, k_rows, v_rows, k_cache, v_cache)


# ---------------------------------------------------------------------------
# 2-D (flattened feature dim) path for tile-UNALIGNED head shapes.
#
# Mosaic only accepts DMA slices whose trailing-two-dim window is tile-aligned:
# single-row copies of [N, H, D] need H%8==0 and D%128==0, and single rows of
# a 2-D [N, X] pool are never legal. Page blocks [S, X] of a 2-D pool ARE
# legal for any X (the slice cuts only the sublane-aligned leading dim). So
# for unaligned shapes the pools are viewed 2-D and written at page
# granularity: full pages stream directly; pages with a mix of valid and
# invalid rows are read-modified-written in VMEM. Decode slots must live in
# distinct pages (guaranteed: one sequence owns a page exclusively).
# ---------------------------------------------------------------------------


def _rmw_decode_kernel_2d(slots_ref, rows, c_in, c_out, pages, sems, *, T, S):
    """Per-token page read-modify-write; rows [T, X] in VMEM."""
    del c_in

    def page_start(t):
        return (slots_ref[t] // S) * S

    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_start(t), S)], pages.at[t], sems.at[t]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_start(t), S)], pages.at[t], sems.at[t]
            ).wait()
            # dynamic-sublane vector stores don't lower; merge via select
            # and store the whole page block statically
            off = slots_ref[t] - page_start(t)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
            pages[t] = jnp.where(row_ids == off, rows[pl.ds(t, 1), :], pages[t])
            pltpu.make_async_copy(
                pages.at[t], c_out.at[pl.ds(page_start(t), S)], sems.at[t]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                pages.at[t], c_out.at[pl.ds(page_start(t), S)], sems.at[t]
            ).wait()


def _page_write_kernel_2d(
    slots_ref, rows, c_in, c_out, page_buf, row_buf, sems, psem, *, T, S
):
    """Page-run writes staged through VMEM double buffers.

    Mosaic rejects dynamic-offset HBM->HBM DMAs (compiler crash, probed on
    v5e), so each page goes rows(HBM, static offset) -> VMEM -> cache(HBM,
    dynamic offset); dynamic offsets are fine when one side is VMEM. A
    partially-valid page first reads the existing page content and merges."""
    del c_in
    n_pages = T // S

    def first(i):
        return slots_ref[i * S]

    def dst_of(i):
        # page-aligned by contract; the //S*S form lets Mosaic prove the
        # dynamic sublane offset is tile-aligned (raw scalars crash the
        # compiler on 2-D dynamic slices)
        return (first(i) // S) * S

    def valid(i):
        return first(i) >= 0

    def full(i):
        return jnp.logical_and(valid(i), slots_ref[i * S + S - 1] >= 0)

    # prefetch page 0's rows
    @pl.when(valid(0))
    def _():
        pltpu.make_async_copy(rows.at[pl.ds(0, S)], row_buf.at[0], sems.at[0]).start()

    for i in range(n_pages):
        slot = i % 2
        nxt = (i + 1) % 2
        if i + 1 < n_pages:
            @pl.when(valid(i + 1))
            def _():
                pltpu.make_async_copy(
                    rows.at[pl.ds((i + 1) * S, S)], row_buf.at[nxt], sems.at[nxt]
                ).start()

        @pl.when(valid(i))
        def _():
            dst = dst_of(i)
            # partial page: merge with existing content read via VMEM
            @pl.when(jnp.logical_not(full(i)))
            def _():
                pltpu.make_async_copy(c_out.at[pl.ds(dst, S)], page_buf, psem).start()
                pltpu.make_async_copy(c_out.at[pl.ds(dst, S)], page_buf, psem).wait()

            pltpu.make_async_copy(
                rows.at[pl.ds(i * S, S)], row_buf.at[slot], sems.at[slot]
            ).wait()

            @pl.when(full(i))
            def _():
                page_buf[...] = row_buf[slot]

            @pl.when(jnp.logical_not(full(i)))
            def _():
                # valid rows form a prefix of the page; merge by count
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                cnt = jnp.int32(0)
                for j in range(S):
                    cnt = cnt + jnp.where(slots_ref[i * S + j] >= 0, 1, 0)
                page_buf[...] = jnp.where(row_ids < cnt, row_buf[slot], page_buf[...])

            pltpu.make_async_copy(page_buf, c_out.at[pl.ds(dst, S)], psem).start()
            pltpu.make_async_copy(page_buf, c_out.at[pl.ds(dst, S)], psem).wait()


@dedup_jit(3)
def write_rows_2d(
    cache: jax.Array,  # [N_slots, ...]; trailing dims flattened internally
    rows: jax.Array,  # [T, ...]
    slot_mapping: jax.Array,
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    T, S = rows.shape[0], page_size
    shape = cache.shape
    c2 = cache.reshape(shape[0], -1)
    r2 = rows.astype(cache.dtype).reshape(T, -1)
    X = c2.shape[1]

    if T >= 2 * S and T % S == 0:
        kernel = functools.partial(_page_write_kernel_2d, T=T, S=S)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ]
        scratch = [
            pltpu.VMEM((S, X), cache.dtype),       # page merge buffer
            pltpu.VMEM((2, S, X), cache.dtype),    # double-buffered row pages
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        kernel = functools.partial(_rmw_decode_kernel_2d, T=T, S=S)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ]
        scratch = [
            pltpu.VMEM((T, S, X), cache.dtype),
            pltpu.SemaphoreType.DMA((T,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(c2.shape, cache.dtype),
        input_output_aliases={2: 0},  # slots=0, rows=1, cache=2
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slot_mapping, r2, c2)
    return out.reshape(shape)


def _rmw_decode_kernel_2d_pair(
    slots_ref, rows_k, rows_v, k_in, v_in, k_out, v_out, pages_k, pages_v, sems, *, T, S
):
    """Paired K/V per-token page read-modify-write (one kernel per layer)."""
    del k_in, v_in

    def page_start(t):
        return (slots_ref[t] // S) * S

    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                k_out.at[pl.ds(page_start(t), S)], pages_k.at[t], sems.at[t, 0]
            ).start()
            pltpu.make_async_copy(
                v_out.at[pl.ds(page_start(t), S)], pages_v.at[t], sems.at[t, 1]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                k_out.at[pl.ds(page_start(t), S)], pages_k.at[t], sems.at[t, 0]
            ).wait()
            pltpu.make_async_copy(
                v_out.at[pl.ds(page_start(t), S)], pages_v.at[t], sems.at[t, 1]
            ).wait()
            off = slots_ref[t] - page_start(t)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
            pages_k[t] = jnp.where(row_ids == off, rows_k[pl.ds(t, 1), :], pages_k[t])
            pages_v[t] = jnp.where(row_ids == off, rows_v[pl.ds(t, 1), :], pages_v[t])
            pltpu.make_async_copy(
                pages_k.at[t], k_out.at[pl.ds(page_start(t), S)], sems.at[t, 0]
            ).start()
            pltpu.make_async_copy(
                pages_v.at[t], v_out.at[pl.ds(page_start(t), S)], sems.at[t, 1]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                pages_k.at[t], k_out.at[pl.ds(page_start(t), S)], sems.at[t, 0]
            ).wait()
            pltpu.make_async_copy(
                pages_v.at[t], v_out.at[pl.ds(page_start(t), S)], sems.at[t, 1]
            ).wait()


@dedup_jit(5)
def write_rows_2d_pair(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_rows: jax.Array,
    v_rows: jax.Array,
    slot_mapping: jax.Array,
    page_size: int,
    interpret: bool = False,
):
    """Paired K/V variant of write_rows_2d (one Pallas call per layer)."""
    T, S = k_rows.shape[0], page_size
    shape = k_cache.shape
    k2 = k_cache.reshape(shape[0], -1)
    v2 = v_cache.reshape(shape[0], -1)
    rk = k_rows.astype(k_cache.dtype).reshape(T, -1)
    rv = v_rows.astype(v_cache.dtype).reshape(T, -1)
    X = k2.shape[1]
    HBM = pltpu.MemorySpace.HBM

    if T >= 2 * S and T % S == 0:
        # prefill: page-run writes, one pool at a time (VMEM-staged; the
        # paired kernel only matters on the per-token decode path)
        ko = write_rows_2d(k_cache, k_rows, slot_mapping, page_size, interpret)
        vo = write_rows_2d(v_cache, v_rows, slot_mapping, page_size, interpret)
        return ko, vo
    if True:
        kernel = functools.partial(_rmw_decode_kernel_2d_pair, T=T, S=S)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=HBM),
            pl.BlockSpec(memory_space=HBM),
        ]
        scratch = [
            pltpu.VMEM((T, S, X), k_cache.dtype),
            pltpu.VMEM((T, S, X), v_cache.dtype),
            pltpu.SemaphoreType.DMA((T, 2)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=HBM), pl.BlockSpec(memory_space=HBM)),
        scratch_shapes=scratch,
    )
    ko, vo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k2.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v2.shape, v_cache.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},  # slots=0, rk=1, rv=2, k=3, v=4
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slot_mapping, rk, rv, k2, v2)
    return ko.reshape(shape), vo.reshape(shape)


# ---------------------------------------------------------------------------
# Head-major pool writes: pool [Hkv, N_slots, X].
#
# Page windows (Hkv, S, X) slice only the middle (slot) dim with the trailing
# two dims (S, X) tile-aligned for ANY head count — the constraint that
# forced slot-major pools through flat 2-D views (probed on v5e:
# tools/probe_fused_writeback.py) disappears in this layout. Decode rows are
# merged by a read-modify-write of the token's page; prefill rows stream in
# page-sized windows from HBM.
# ---------------------------------------------------------------------------


def _rmw_decode_kernel_hm(slots_ref, rows, c_in, c_out, pbuf, sems, *, T, S):
    """Per-token block RMW; rows [Hkv, T, X] in VMEM (head-major).

    ``S`` here is the RMW window: the smallest legal sublane-aligned block
    (8 rows) rather than the full page when the page size allows — only the
    block containing the row moves through VMEM, halving decode write
    traffic vs page-sized RMW at page_size 16."""
    del c_in

    def blk_start(t):
        return (slots_ref[t] // S) * S

    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[:, pl.ds(blk_start(t), S)], pbuf.at[t], sems.at[t]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[:, pl.ds(blk_start(t), S)], pbuf.at[t], sems.at[t]
            ).wait()
            off = slots_ref[t] - blk_start(t)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
            pbuf[t] = jnp.where(row_ids == off, rows[:, pl.ds(t, 1), :], pbuf[t])
            pltpu.make_async_copy(
                pbuf.at[t], c_out.at[:, pl.ds(blk_start(t), S)], sems.at[t]
            ).start()
    for t in range(T):
        @pl.when(slots_ref[t] >= 0)
        def _():
            pltpu.make_async_copy(
                pbuf.at[t], c_out.at[:, pl.ds(blk_start(t), S)], sems.at[t]
            ).wait()


def _page_write_kernel_hm(
    slots_ref, rows, c_in, c_out, page_buf, row_buf, sems, psem, *, T, S
):
    """Prefill page-run writes; rows [Hkv, T, X] in HBM, staged per page."""
    del c_in
    n_pages = T // S

    def first(i):
        return slots_ref[i * S]

    def dst_of(i):
        return (first(i) // S) * S

    def valid(i):
        return first(i) >= 0

    def full(i):
        return jnp.logical_and(valid(i), slots_ref[i * S + S - 1] >= 0)

    @pl.when(valid(0))
    def _():
        pltpu.make_async_copy(
            rows.at[:, pl.ds(0, S)], row_buf.at[0], sems.at[0]
        ).start()

    for i in range(n_pages):
        slot = i % 2
        nxt = (i + 1) % 2
        if i + 1 < n_pages:
            @pl.when(valid(i + 1))
            def _():
                pltpu.make_async_copy(
                    rows.at[:, pl.ds((i + 1) * S, S)], row_buf.at[nxt], sems.at[nxt]
                ).start()

        @pl.when(valid(i))
        def _():
            dst = dst_of(i)

            @pl.when(jnp.logical_not(full(i)))
            def _():
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(dst, S)], page_buf, psem
                ).start()
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(dst, S)], page_buf, psem
                ).wait()

            pltpu.make_async_copy(
                rows.at[:, pl.ds(i * S, S)], row_buf.at[slot], sems.at[slot]
            ).wait()

            @pl.when(full(i))
            def _():
                page_buf[...] = row_buf[slot]

            @pl.when(jnp.logical_not(full(i)))
            def _():
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
                cnt = jnp.int32(0)
                for j in range(S):
                    cnt = cnt + jnp.where(slots_ref[i * S + j] >= 0, 1, 0)
                page_buf[...] = jnp.where(row_ids < cnt, row_buf[slot], page_buf[...])

            pltpu.make_async_copy(page_buf, c_out.at[:, pl.ds(dst, S)], psem).start()
            pltpu.make_async_copy(page_buf, c_out.at[:, pl.ds(dst, S)], psem).wait()


@dedup_jit(3)
def write_rows_hm(
    pool: jax.Array,  # [Hkv, N_slots, X] head-major
    rows: jax.Array,  # [T, Hkv, X] (token-major, as produced by projections)
    slot_mapping: jax.Array,  # [T]; <0 => skip
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    """In-place row writes into a head-major pool; returns the pool."""
    T, S = rows.shape[0], page_size
    H, N, X = pool.shape
    # transpose once in XLA (tiny for decode; one page-sized op per chunk
    # for prefill) so the kernel's DMAs are pure page windows
    rows_hm = jnp.swapaxes(rows.astype(pool.dtype), 0, 1)  # [Hkv, T, X]
    HBM = pltpu.MemorySpace.HBM

    if T >= 2 * S and T % S == 0:
        kernel = functools.partial(_page_write_kernel_hm, T=T, S=S)
        in_specs = [
            pl.BlockSpec(memory_space=HBM),
            pl.BlockSpec(memory_space=HBM),
        ]
        scratch = [
            pltpu.VMEM((H, S, X), pool.dtype),     # page merge buffer
            pltpu.VMEM((2, H, S, X), pool.dtype),  # double-buffered row pages
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        # decode RMW moves the smallest legal sublane-aligned block (8 rows)
        # around each written row, not the whole page
        B = 8 if S % 8 == 0 else S
        kernel = functools.partial(_rmw_decode_kernel_hm, T=T, S=B)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=HBM),
        ]
        scratch = [
            pltpu.VMEM((T, H, B, X), pool.dtype),
            pltpu.SemaphoreType.DMA((T,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=HBM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={2: 0},  # slots=0, rows=1, pool=2
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slot_mapping, rows_hm, pool)


# ---------------------------------------------------------------------------
# Decode-window side-buffer flush (window-batched KV writes)
# ---------------------------------------------------------------------------

def _side_page_runs(entry_pos, n_rows, page_tables, S):
    """Split each slot's contiguous window rows into its <=2 page runs:
    returns (starts1, lens1, starts2, lens2) pool-row scalars."""
    maxp = page_tables.shape[1]
    safe_tables = jnp.maximum(page_tables, 0)
    pg1 = jnp.clip(entry_pos // S, 0, maxp - 1)
    page1 = jnp.take_along_axis(safe_tables, pg1[:, None], axis=1)[:, 0]
    off1 = entry_pos % S
    starts1 = page1 * S + off1
    lens1 = jnp.minimum(n_rows, S - off1)
    p2 = entry_pos + lens1
    pg2 = jnp.clip(p2 // S, 0, maxp - 1)
    page2 = jnp.take_along_axis(safe_tables, pg2[:, None], axis=1)[:, 0]
    starts2 = page2 * S
    lens2 = jnp.maximum(n_rows - lens1, 0)
    return starts1, lens1, starts2, lens2


def _flush_side_kernel_hm(
    starts1_ref,  # [B] pool row of a slot's first window row; <0 => skip
    lens1_ref,    # [B] rows in the first page run
    starts2_ref,  # [B] pool row of the second page run (page-aligned)
    lens2_ref,    # [B] rows in the second run (0 if the run fits one page)
    side,         # [B, Hkv, Kw, X] VMEM: per-slot window rows
    c_in,
    c_out,        # [Hkv, N, X] pool (aliased)
    pbuf,         # [G, 2, Hkv, S, X] VMEM page staging (G slots at a time)
    sems,         # DMA sems [G, 2]
    *,
    B: int,
    S: int,
    Kw: int,
    G: int,
):
    """Write each slot's up-to-Kw contiguous window rows into its <=2 pool
    pages with one page RMW per run: all page reads of a slot group start
    first, each page then merges its rows via a [S, Kw] selection-matrix dot
    (the Mosaic-friendly dynamic row shift) and writes back. Pages of
    different slots never alias (each page belongs to one sequence), so the
    RMWs are race-free. Slots are processed G at a time so the staging
    scratch stays within the scoped-VMEM budget at any page size (B pages
    at once overflowed it at S >= 64)."""
    del c_in

    def page_of(start):
        return (start // S) * S

    for g0 in range(0, B, G):
        group = range(g0, min(g0 + G, B))
        for b in group:
            gb = b - g0
            @pl.when(lens1_ref[b] > 0)
            def _():
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(page_of(starts1_ref[b]), S)],
                    pbuf.at[gb, 0],
                    sems.at[gb, 0],
                ).start()
            @pl.when(lens2_ref[b] > 0)
            def _():
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(page_of(starts2_ref[b]), S)],
                    pbuf.at[gb, 1],
                    sems.at[gb, 1],
                ).start()

        for b in group:
            gb = b - g0
            rows_b = side[b]  # [Hkv, Kw, X]

            def merge_run(r, start, j0, length):
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(page_of(start), S)], pbuf.at[gb, r],
                    sems.at[gb, r],
                ).wait()
                off = start - page_of(start)
                # sel[s, j] = 1 where pool row s receives side column j
                s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S, Kw), 1)
                j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S, Kw), 2)
                hit = (s_iota - off == j_iota - j0) & (j_iota >= j0) & (
                    j_iota < j0 + length
                )
                sel = jnp.broadcast_to(
                    jnp.where(hit, 1.0, 0.0).astype(rows_b.dtype),
                    (rows_b.shape[0], S, Kw),
                )
                # int8 pools need an int accumulator (Mosaic rejects float acc
                # with int operands); 0/1 selection x int8 rows is exact in i32
                acc_t = jnp.int32 if rows_b.dtype == jnp.int8 else jnp.float32
                upd = jax.lax.dot_general(
                    sel, rows_b, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=acc_t,
                )  # [Hkv, S, X]
                row_hit = (s_iota[..., :1] >= off) & (s_iota[..., :1] < off + length)
                pbuf[gb, r] = jnp.where(row_hit, upd.astype(pbuf.dtype), pbuf[gb, r])
                pltpu.make_async_copy(
                    pbuf.at[gb, r], c_out.at[:, pl.ds(page_of(start), S)],
                    sems.at[gb, r],
                ).start()

            @pl.when(lens1_ref[b] > 0)
            def _():
                merge_run(0, starts1_ref[b], 0, lens1_ref[b])

            @pl.when(lens2_ref[b] > 0)
            def _():
                merge_run(1, starts2_ref[b], lens1_ref[b], lens2_ref[b])

        # drain the group's write-backs before its pbuf rows are reused
        for b in group:
            gb = b - g0
            @pl.when(lens1_ref[b] > 0)
            def _():
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(page_of(starts1_ref[b]), S)],
                    pbuf.at[gb, 0],
                    sems.at[gb, 0],
                ).wait()
            @pl.when(lens2_ref[b] > 0)
            def _():
                pltpu.make_async_copy(
                    c_out.at[:, pl.ds(page_of(starts2_ref[b]), S)],
                    pbuf.at[gb, 1],
                    sems.at[gb, 1],
                ).wait()


@dedup_jit(5)
def flush_side_rows_hm(
    pool: jax.Array,       # [Hkv, N_slots, X] head-major packed pool
    side: jax.Array,       # [B, Hkv, Kw, X] window rows (col j = step-j row)
    entry_pos: jax.Array,  # [B] int32 position of each slot's first window row
    n_rows: jax.Array,     # [B] int32 valid window rows (0 => untouched slot)
    page_tables: jax.Array,  # [B, maxp]
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    """End-of-window flush of the decode side buffer into the paged pool.

    A slot's n_rows window rows sit at consecutive positions entry_pos ...
    entry_pos + n_rows - 1, spanning at most two pages when n_rows <=
    page_size. Replaces n_rows per-step RMW writes per slot with <=2 page
    RMWs per slot per window."""
    B, Hkv, Kw, X = side.shape
    S = page_size
    assert Kw <= S, "window rows must fit a page"

    starts1, lens1, starts2, lens2 = _side_page_runs(
        entry_pos, n_rows, page_tables, S
    )

    # slot-group size: stage at most ~6 MB of pages at once so the scratch
    # fits the scoped-VMEM budget at any page size (S >= 64 with all B slots
    # staged exceeded the 16 MB limit)
    page_bytes = 2 * Hkv * S * X * pool.dtype.itemsize
    G = max(1, min(B, (6 << 20) // max(page_bytes, 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # side
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pool in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((G, 2, Hkv, S, X), pool.dtype),
            pltpu.SemaphoreType.DMA((G, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flush_side_kernel_hm, B=B, S=S, Kw=Kw, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={5: 0},  # scalars 0-3, side=4, pool=5
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts1, lens1, starts2, lens2, side.astype(pool.dtype), pool)


def _flush_side_kernel_2d(
    starts1_ref, lens1_ref, starts2_ref, lens2_ref,
    side,    # [B, Kw, X] VMEM
    c_in,
    c_out,   # [N, X] pool (aliased)
    pbuf,    # [B, 2, S, X] VMEM
    sems,
    *,
    B: int,
    S: int,
    Kw: int,
):
    """2-D (slot-major) variant of _flush_side_kernel_hm for latent pools."""
    del c_in

    def page_of(start):
        return (start // S) * S

    for b in range(B):
        @pl.when(lens1_ref[b] > 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_of(starts1_ref[b]), S)], pbuf.at[b, 0],
                sems.at[b, 0],
            ).start()
        @pl.when(lens2_ref[b] > 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_of(starts2_ref[b]), S)], pbuf.at[b, 1],
                sems.at[b, 1],
            ).start()

    for b in range(B):
        rows_b = side[b]  # [Kw, X]

        def merge_run(r, start, j0, length):
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_of(start), S)], pbuf.at[b, r], sems.at[b, r]
            ).wait()
            off = start - page_of(start)
            s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Kw), 0)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (S, Kw), 1)
            hit = (s_iota - off == j_iota - j0) & (j_iota >= j0) & (
                j_iota < j0 + length
            )
            sel = jnp.where(hit, 1.0, 0.0).astype(rows_b.dtype)
            acc_t = jnp.int32 if rows_b.dtype == jnp.int8 else jnp.float32
            upd = jax.lax.dot_general(
                sel, rows_b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )  # [S, X]
            row_hit = (s_iota[:, :1] >= off) & (s_iota[:, :1] < off + length)
            pbuf[b, r] = jnp.where(row_hit, upd.astype(pbuf.dtype), pbuf[b, r])
            pltpu.make_async_copy(
                pbuf.at[b, r], c_out.at[pl.ds(page_of(start), S)], sems.at[b, r]
            ).start()

        @pl.when(lens1_ref[b] > 0)
        def _():
            merge_run(0, starts1_ref[b], 0, lens1_ref[b])

        @pl.when(lens2_ref[b] > 0)
        def _():
            merge_run(1, starts2_ref[b], lens1_ref[b], lens2_ref[b])

    for b in range(B):
        @pl.when(lens1_ref[b] > 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_of(starts1_ref[b]), S)], pbuf.at[b, 0],
                sems.at[b, 0],
            ).wait()
        @pl.when(lens2_ref[b] > 0)
        def _():
            pltpu.make_async_copy(
                c_out.at[pl.ds(page_of(starts2_ref[b]), S)], pbuf.at[b, 1],
                sems.at[b, 1],
            ).wait()


@dedup_jit(5)
def flush_side_rows_2d(
    pool: jax.Array,       # [N_slots, X] slot-major (e.g. MLA latent)
    side: jax.Array,       # [B, Kw, X] window rows
    entry_pos: jax.Array,  # [B]
    n_rows: jax.Array,     # [B]
    page_tables: jax.Array,
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    """flush_side_rows_hm for 2-D slot-major pools (MLA latent cache)."""
    B, Kw, X = side.shape
    S = page_size
    assert Kw <= S, "window rows must fit a page"

    starts1, lens1, starts2, lens2 = _side_page_runs(
        entry_pos, n_rows, page_tables, S
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((B, 2, S, X), pool.dtype),
            pltpu.SemaphoreType.DMA((B, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flush_side_kernel_2d, B=B, S=S, Kw=Kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts1, lens1, starts2, lens2, side.astype(pool.dtype), pool)
