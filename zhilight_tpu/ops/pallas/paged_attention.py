"""Pallas TPU kernel: fused batched decode attention over the paged KV cache.

This is the TPU-native replacement for the reference's fused batch MQA/GQA
WMMA decode kernels over ragged buffers (src/nn/attention/attention_kernel.cu
KERNEL_mqa_rag_buffer family, :539-1100) and its flash-decoding integration.

Design (bandwidth-first — decode attention is HBM-bound):
  * K/V pools are slot-major ``[num_slots, Hkv, D]`` so one page is one
    contiguous ``[page_size, Hkv, D]`` chunk; pages stay in HBM
    (`memory_space=ANY`) and the kernel DMAs ``pages_per_block`` pages at a
    time into a double-buffered VMEM scratch, prefetching block i+1 while
    computing block i. Slicing the untiled slot dim is legal for any head_dim.
  * grid = (batch, page_blocks); page indices come from the scalar-prefetched
    block table; out-of-range positions clamp to the last valid page (the
    causal mask removes their contribution — the buffers must never hold
    uninitialized VMEM, 0 * NaN = NaN in the p @ v accumulation).
  * online-softmax accumulation in fp32 VMEM scratch across page blocks;
    batched-head matmuls serve GQA (G>1) and MHA (G=1) alike.

A BlockSpec-pipelined variant (Mosaic-managed fetches, ``fetch_pages``
independent page windows per grid step) is kept for comparison/debugging via
``use_blockspec=True``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dedup import dedup_jit

__all__ = [
    "paged_decode_attention",
    "paged_decode_attention_fused",
    "paged_mla_decode",
    "paged_mla_decode_fused",
    "paged_decode_attention_q",
]

NEG_INF = -2.0e38


def _kernel(
    # scalar prefetch
    page_tables_ref,  # [B, maxp] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    # inputs
    q_ref,  # [1, Hkv, G, D] VMEM
    k_hbm,  # [N_slots, Hkv, D] ANY (HBM)
    v_hbm,  # [N_slots, Hkv, D] ANY (HBM)
    # output
    o_ref,  # [1, Hkv, G, D] VMEM
    # scratch
    m_ref,  # [Hkv, G, 1] f32
    l_ref,  # [Hkv, G, 1] f32
    acc_ref,  # [Hkv, G, D] f32
    k_buf,  # [2, PPB*S, Hkv, D]
    v_buf,  # [2, PPB*S, Hkv, D]
    sems,  # DMA semaphores [2, 2, PPB]
    *,
    page_size: int,
    pages_per_block: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    S, PPB = page_size, pages_per_block
    ctx = context_lens_ref[b]
    num_valid_pages = pl.cdiv(ctx, S)

    def _page_at(page_pos):
        # Clamp out-of-range positions to the last valid page so every DMA
        # lands on real data: the softmax mask removes those tokens, but the
        # buffers must not hold uninitialized VMEM (0 * NaN = NaN in p @ v).
        safe_pos = jnp.minimum(page_pos, jnp.maximum(num_valid_pages - 1, 0))
        return page_tables_ref[b, safe_pos]

    def start_copies(block_idx, slot):
        for j in range(PPB):
            page = _page_at(block_idx * PPB + j)
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(page * S, S)], k_buf.at[slot, pl.ds(j * S, S)], sems.at[slot, 0, j]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(page * S, S)], v_buf.at[slot, pl.ds(j * S, S)], sems.at[slot, 1, j]
            ).start()

    def wait_copies(block_idx, slot):
        for j in range(PPB):
            page = _page_at(block_idx * PPB + j)
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(page * S, S)], k_buf.at[slot, pl.ds(j * S, S)], sems.at[slot, 0, j]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(page * S, S)], v_buf.at[slot, pl.ds(j * S, S)], sems.at[slot, 1, j]
            ).wait()

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        # start/wait pairing: copies for block X are issued iff block X is
        # active, and waited under the same predicate in _compute.
        @pl.when(num_valid_pages > 0)
        def _():
            start_copies(0, 0)

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)
    block_active = (i * PPB) < num_valid_pages

    @pl.when(jnp.logical_and(i + 1 < num_blocks, ((i + 1) * PPB) < num_valid_pages))
    def _prefetch():
        start_copies(i + 1, next_slot)

    @pl.when(block_active)
    def _compute():
        wait_copies(i, slot)
        q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
        Hkv = q.shape[0]
        if Hkv == 1:
            # MQA / MLA latent decode: plain 2-D matmuls, no batch dims
            k2 = k_buf[slot][:, 0].astype(jnp.float32)  # [T, D]
            v2 = v_buf[slot][:, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                q[0], k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )[None]  # [1, G, T]
        else:
            # DMA deposits pages token-major [T, Hkv, D]; Mosaic batched
            # matmuls need the batch dim leading on both operands, so
            # relayout to [Hkv, T, D] once per block (VMEM-local)
            k = jnp.swapaxes(k_buf[slot], 0, 1).astype(jnp.float32)  # [Hkv, T, D]
            v = jnp.swapaxes(v_buf[slot], 0, 1).astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # [Hkv, G, PPB*S]
        s = s * scale

        token_idx = i * (PPB * S) + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=2
        )
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if Hkv == 1:
            upd = jax.lax.dot_general(
                p[0], v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )[None]  # [1, G, D]
        else:
            upd = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-20)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _kernel_bs(
    # scalar prefetch
    page_tables_ref,
    context_lens_ref,
    # blocks: q, then FPB k-page blocks, then FPB v-page blocks
    # (packed mode: q, then FPB packed K|V page blocks)
    *refs,
    page_size: int,
    fetch_pages: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
    packed_dim: int = 0,
    v_dim: int = 0,  # MLA latent mode: scores over the full stored dim
                     # (query zero-padded), V = prefix slice [..., :v_dim]
    emit_partial: bool = False,
):
    """BlockSpec-pipelined variant: Mosaic's pipeline does the page fetches
    through ``fetch_pages`` independent page windows per grid step (one-page
    steps were ~7x off HBM roofline from fixed per-step cost). Out-of-range
    positions clamp to the last valid page; the causal mask removes their
    contribution."""
    q_ref = refs[0]
    if packed_dim or v_dim:
        kv_refs = refs[1 : 1 + fetch_pages]
        o_ref, m_ref, l_ref, acc_ref = refs[1 + fetch_pages :]
    else:
        k_refs = refs[1 : 1 + fetch_pages]
        v_refs = refs[1 + fetch_pages : 1 + 2 * fetch_pages]
        o_ref, m_ref, l_ref, acc_ref = refs[1 + 2 * fetch_pages :]

    b = pl.program_id(0)
    i = pl.program_id(1)
    ctx = context_lens_ref[b]
    S, FPB = page_size, fetch_pages

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    num_valid_pages = pl.cdiv(ctx, S)

    @pl.when((i * FPB) < num_valid_pages)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
        Hkv = q.shape[0]
        if v_dim:
            kvt = jnp.concatenate([r[:] for r in kv_refs], axis=0)  # [FPB*S, 1, stored]
            kt = kvt
            vt = kvt[..., :v_dim]
        elif packed_dim:
            kvt = jnp.concatenate([r[:] for r in kv_refs], axis=0)  # [FPB*S, Hkv, 2D]
            kt = kvt[..., :packed_dim]
            vt = kvt[..., packed_dim:]
        else:
            kt = jnp.concatenate([r[:] for r in k_refs], axis=0)  # [FPB*S, Hkv, D]
            vt = jnp.concatenate([r[:] for r in v_refs], axis=0)
        if Hkv == 1:
            k2 = kt[:, 0].astype(jnp.float32)
            v2 = vt[:, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                q[0], k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            k = jnp.swapaxes(kt, 0, 1).astype(jnp.float32)  # [Hkv, FPB*S, D]
            v = jnp.swapaxes(vt, 0, 1).astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # [Hkv, G, FPB*S]
        s = s * scale
        token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if Hkv == 1:
            upd = jax.lax.dot_general(
                p[0], v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            upd = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        if emit_partial:
            # flash partials for XLA-side merging with out-of-pool rows:
            # a 128-lane header carries the running max (lane 0) and
            # normalizer (lane 1); the UNNORMALIZED accumulator follows
            Hh, Gg, _ = acc_ref.shape
            lane = jax.lax.broadcasted_iota(jnp.int32, (Hh, Gg, 128), 2)
            head = jnp.where(
                lane == 0,
                m_ref[...],
                jnp.where(lane == 1, l_ref[...], 0.0),
            )
            o_ref[0] = jnp.concatenate([head, acc_ref[...]], axis=-1).astype(
                o_ref.dtype
            )
        else:
            l = jnp.maximum(l_ref[...], 1e-20)
            o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _paged_decode_blockspec(
    q_g,  # [B, Hkv, G, D]
    k_pages, v_pages, safe_tables, context_lens, page_size, scale,
    sliding_window, interpret, fetch_pages=8, packed=False, v_dim=0,
    emit_partial=False,
):
    B, Hkv, G, D = q_g.shape
    S = page_size
    maxp = safe_tables.shape[1]
    FPB = min(fetch_pages, maxp)
    num_blocks = (maxp + FPB - 1) // FPB
    stored = k_pages.shape[-1]  # 2D when packed; latent width in MLA mode
    Dv = v_dim if v_dim else D
    Dout = Dv + 128 if emit_partial else Dv

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    def kv_index_at(j):
        def kv_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0, 0)

        return kv_index

    kv_specs = [pl.BlockSpec((S, Hkv, stored), kv_index_at(j)) for j in range(FPB)]
    if packed or v_dim:
        in_specs = [pl.BlockSpec((1, Hkv, G, D), q_index)] + kv_specs
        operands = (safe_tables, context_lens, q_g, *([k_pages] * FPB))
    else:
        in_specs = [pl.BlockSpec((1, Hkv, G, D), q_index)] + kv_specs + kv_specs
        operands = (safe_tables, context_lens, q_g, *([k_pages] * FPB), *([v_pages] * FPB))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, Dout), q_index),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, Dv), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_bs,
        page_size=S,
        fetch_pages=FPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
        packed_dim=D if packed else 0,
        v_dim=v_dim,
        emit_partial=emit_partial,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, Hkv, G, Dout), jnp.float32 if emit_partial else q_g.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


@dedup_jit(5)
def paged_decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k_pages: jax.Array,  # [N_slots, Hkv, D]
    v_pages: jax.Array,  # [N_slots, Hkv, D]
    page_tables: jax.Array,  # [B, maxp] int32, -1 padded
    context_lens: jax.Array,  # [B] int32
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    pages_per_block: int = 8,
    interpret: bool = False,
    use_blockspec: bool = False,
    packed: bool = False,  # k_pages holds K|V lane-packed [N, Hkv, 2D]
) -> jax.Array:
    B, Hq, D = q.shape
    _, Hkv, _ = k_pages.shape
    S = page_size
    G = Hq // Hkv
    maxp = page_tables.shape[1]
    PPB = min(pages_per_block, maxp)
    num_blocks = (maxp + PPB - 1) // PPB

    q_g = q.reshape(B, Hkv, G, D)
    safe_tables = jnp.maximum(page_tables, 0)

    # The manual-DMA kernel slices its VMEM scratch at page granularity;
    # Mosaic rejects slices of lane/sublane-padded buffers, so it needs
    # tile-aligned (Hkv, D). Everything else takes the BlockSpec variant
    # (Mosaic-managed page fetches handle padding internally).
    if packed or D % 128 != 0 or Hkv % 8 != 0:
        use_blockspec = True

    if use_blockspec:
        return _paged_decode_blockspec(
            q_g, k_pages, v_pages, safe_tables, context_lens, S, scale,
            sliding_window, interpret, fetch_pages=PPB, packed=packed,
        ).reshape(B, Hq, D)

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_blocks),
        in_specs=[
            pl.BlockSpec((1, Hkv, G, D), q_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, D), jnp.float32),
            pltpu.VMEM((2, PPB * S, Hkv, D), k_pages.dtype),
            pltpu.VMEM((2, PPB * S, Hkv, D), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, PPB)),
        ],
    )

    kernel = functools.partial(
        _kernel,
        page_size=S,
        pages_per_block=PPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(safe_tables, context_lens, q_g, k_pages, v_pages)
    return out.reshape(B, Hq, D)


def _kernel_bs_fused(
    # scalar prefetch
    slots_ref,        # [B] int32 flat slot of the token being written; <0 => skip
    page_tables_ref,  # [B, maxp]
    context_lens_ref, # [B] (INCLUDES the current token)
    *refs,
    page_size: int,
    fetch_pages: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
    packed_dim: int,  # >0: single K|V pool, lanes [K|V]
    v_dim: int = 0,   # MLA latent mode: scores over the full stored width,
                      # V = prefix slice [..., :v_dim] (single pool, Hkv=1)
    wb_2d: bool = False,  # write back through a flat [N, X] pool view
):
    """Decode attention with the current token's KV write fused in.

    The separate write kernel + attention kernel pair costs two Pallas
    launches per layer per step AND leaves the pool's layout to XLA between
    them. Fused, cached tokens are masked to ``ctx-1`` (the new row is NOT in
    the pool yet); the new token's score column is computed from the VMEM row
    and folded into the online softmax at the finish step, and the row's page
    is read-modified-written back to the pool, which is input_output-aliased —
    one launch, no separate write kernel, pool layout stays default.

    Replaces the reference's copy_to_rag_buffer2-then-attention sequence
    (src/kvcache/ragged_buffer_kernel.cu + attention_kernel.cu) for decode.

    Write-back granularity is one page (RMW): page windows are DMA-legal
    where single rows are not. ``wb_2d`` selects the flat [N, X] page view
    for pools whose head dim is not sublane-aligned (Hkv>8 and Hkv%8!=0 —
    3-D page windows are rejected for those, probed on v5e); aligned pools
    use the 3-D view directly so the kernel sees a single pool value (a
    bitcast view as a second operand makes XLA materialize the reshape and
    defensively copy the pool every layer).

    Page-exclusivity contract: a written slot's page is owned exclusively by
    its sequence (prefix-cache shared pages are read-only), so concurrent
    fetches of that page by other grid steps only ever read rows that the
    causal mask discards.

    Fully-masked-block edge cases (e.g. ctx == 1: no cached tokens at all)
    self-correct: a fully-masked block leaves m == NEG_INF, p == exp(0) == 1
    pollutes l/acc, but the finish fold rescales by alpha == exp(NEG_INF -
    s_new) == 0, zeroing the garbage before adding the new-token term.
    """
    S, FPB = page_size, fetch_pages
    single = bool(packed_dim or v_dim)
    n_pools = 1 if single else 2
    # inputs: q, fetch blocks (FPB per pool), new rows (one [1, Hkv, stored]
    # per pool), flat new rows (one [1, 1, X] per pool, wb_2d only), pool
    # (ANY, one per pool); outputs: o, pools; scratch: m, l, acc, page
    # buffers (one per pool), DMA sems
    q_ref = refs[0]
    pos = 1
    fetch = [refs[pos + k * FPB : pos + (k + 1) * FPB] for k in range(n_pools)]
    pos += n_pools * FPB
    new3 = refs[pos : pos + n_pools]
    pos += n_pools
    if wb_2d:
        new_wb = refs[pos : pos + n_pools]
        pos += n_pools
    else:
        new_wb = new3
    pos += n_pools  # pool ANY inputs (aliased; written via the output refs)
    o_ref = refs[pos]
    pool_out = refs[pos + 1 : pos + 1 + n_pools]
    pos += 1 + n_pools
    m_ref, l_ref, acc_ref = refs[pos : pos + 3]
    pbufs = refs[pos + 3 : pos + 3 + n_pools]
    wsem = refs[pos + 3 + n_pools]

    if single:
        k_list = v_list = fetch[0]
    else:
        k_list, v_list = fetch

    def new_kv():
        if v_dim:
            row = new3[0][0].astype(jnp.float32)  # [1, stored]
            return row, row[..., :v_dim]
        if packed_dim:
            row = new3[0][0].astype(jnp.float32)  # [Hkv, 2D]
            return row[..., :packed_dim], row[..., packed_dim:]
        return new3[0][0].astype(jnp.float32), new3[1][0].astype(jnp.float32)

    b = pl.program_id(0)
    i = pl.program_id(1)
    ctx = context_lens_ref[b]
    slot = slots_ref[b]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    num_valid_pages = pl.cdiv(ctx, S)
    cur = ctx - 1                 # position of the token being written
    cur_pp = cur // S             # its page position in the table
    in_block = jnp.logical_and(slot >= 0, cur_pp // FPB == i)

    @pl.when((i * FPB) < num_valid_pages)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
        Hkv = q.shape[0]
        if v_dim:
            kvt = jnp.concatenate([r[:] for r in k_list], axis=0)
            kt = kvt
            vt = kvt[..., :v_dim]
        elif packed_dim:
            kvt = jnp.concatenate([r[:] for r in k_list], axis=0)
            kt = kvt[..., :packed_dim]
            vt = kvt[..., packed_dim:]
        else:
            kt = jnp.concatenate([r[:] for r in k_list], axis=0)
            vt = jnp.concatenate([r[:] for r in v_list], axis=0)
        if Hkv == 1:
            k2 = kt[:, 0].astype(jnp.float32)
            v2 = vt[:, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                q[0], k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            k = jnp.swapaxes(kt, 0, 1).astype(jnp.float32)
            v = jnp.swapaxes(vt, 0, 1).astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        s = s * scale
        token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        # the row at ctx-1 is NOT in the pool yet — its column is folded in
        # at _finish from the VMEM row
        mask = token_idx < ctx - 1
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if Hkv == 1:
            upd = jax.lax.dot_general(
                p[0], v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            upd = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

        # read-modify-write the new row's page back to the (aliased) pool:
        # read page -> merge row -> write page.
        @pl.when(in_block)
        def _writeback():
            dst = (slot // S) * S  # provably page-aligned for Mosaic
            for k in range(n_pools):
                buf, out_hbm = pbufs[k], pool_out[k]
                rid = jax.lax.broadcasted_iota(
                    jnp.int32, (S,) + (1,) * (buf.ndim - 1), 0
                )
                new_row = new_wb[k][0]  # [Hkv, stored] or [1, X]
                if buf.ndim == 2:
                    pass  # new_row [1, X] broadcasts over buf [S, X]
                else:
                    new_row = new_row[None]  # [1, Hkv, stored]
                cp = pltpu.make_async_copy(
                    out_hbm.at[pl.ds(dst, S)], buf, wsem.at[k]
                )
                cp.start()
                cp.wait()
                buf[...] = jnp.where(rid == cur % S, new_row, buf[...])
                cp = pltpu.make_async_copy(
                    buf, out_hbm.at[pl.ds(dst, S)], wsem.at[k]
                )
                cp.start()
                cp.wait()

    @pl.when(i == num_blocks - 1)
    def _finish():
        # fold in the new token's column (computed from the VMEM row, since
        # the pool row was stale when fetched)
        q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
        k_new, v_new = new_kv()           # [Hkv, D] each
        s_new = jnp.sum(q * k_new[:, None, :], axis=-1, keepdims=True) * scale
        m_prev = m_ref[...]
        m_f = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_f)
        p_new = jnp.exp(s_new - m_f)
        l = l_ref[...] * alpha + p_new
        acc = acc_ref[...] * alpha + p_new * v_new[:, None, :]
        l = jnp.maximum(l, 1e-20)
        o_ref[0] = (acc / l).astype(o_ref.dtype)


@dedup_jit(8)
def paged_decode_attention_fused(
    q: jax.Array,            # [B, Hq, D]
    k_pages: jax.Array,      # [N, Hkv, D] (packed: [N, Hkv, 2D] K|V lanes)
    v_pages: Optional[jax.Array],  # None when packed
    k_new: jax.Array,        # [B, Hkv, D] rows for the current tokens
    v_new: jax.Array,        # [B, Hkv, D]
    slot_mapping: jax.Array, # [B] int32; <0 => skip write (frozen slot)
    page_tables: jax.Array,  # [B, maxp]
    context_lens: jax.Array, # [B] INCLUDING the current token
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    fetch_pages: int = 8,
    interpret: bool = False,
    v_dim: int = 0,  # MLA latent mode: single pool, V = latent[..., :v_dim]
):
    """Fused decode: writes each sequence's new KV row into its page and
    attends over the full context in one kernel. Returns (out [B, Hq, Dv],
    k_pages', v_pages'); the pools are input_output-aliased (donate them)."""
    B, Hq, D = q.shape
    _, Hkv, stored = k_pages.shape
    single = v_pages is None
    packed = single and v_dim == 0
    Dv = v_dim if v_dim else D
    S = page_size
    G = Hq // Hkv
    maxp = page_tables.shape[1]
    FPB = min(fetch_pages, maxp)
    num_blocks = (maxp + FPB - 1) // FPB
    # page write-back view: 3-D windows are only DMA-legal for sublane-
    # aligned head dims; others go through the flat [N, X] bitcast view
    # (costs a materialized reshape + defensive pool copies in XLA — the
    # aligned single-view path is the fast one)
    wb_2d = Hkv > 8 and Hkv % 8 != 0
    N = k_pages.shape[0]
    X = Hkv * stored

    q_g = q.reshape(B, Hkv, G, D)
    safe_tables = jnp.maximum(page_tables, 0)
    if packed:
        new_rows = [
            jnp.concatenate(
                [k_new.astype(k_pages.dtype), v_new.astype(k_pages.dtype)], axis=-1
            )
        ]  # [B, Hkv, 2D]
        pools = [k_pages]
    elif single:  # MLA latent: k_new IS the full stored row
        new_rows = [k_new.astype(k_pages.dtype)]
        pools = [k_pages]
    else:
        new_rows = [k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype)]
        pools = [k_pages, v_pages]
    n_pools = len(pools)

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    def new_index(b, i, *_):
        return (b, 0, 0)

    def kv_index_at(j):
        def kv_index(b, i, slots_ref, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0, 0)

        return kv_index

    kv_specs = [pl.BlockSpec((S, Hkv, stored), kv_index_at(j)) for j in range(FPB)]
    new_spec = pl.BlockSpec((1, Hkv, stored), new_index)
    # [B, 1, X] with block (1, 1, X): the last two block dims must equal
    # the array dims (a bare (1, X) block is rejected by the lowering)
    new2_spec = pl.BlockSpec((1, 1, X), new_index)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [pl.BlockSpec((1, Hkv, G, D), q_index)]
    operands = [slot_mapping, safe_tables, context_lens, q_g]
    for pool in pools:
        in_specs += [kv_specs[j] for j in range(FPB)]
        operands += [pool] * FPB
    in_specs += [new_spec] * n_pools
    operands += new_rows
    if wb_2d:
        in_specs += [new2_spec] * n_pools
        operands += [r.reshape(B, 1, X) for r in new_rows]
    in_specs += [any_spec] * n_pools
    pool_ops = [p.reshape(N, X) for p in pools] if wb_2d else pools
    operands += pool_ops

    out_shape = [jax.ShapeDtypeStruct((B, Hkv, G, Dv), q.dtype)] + [
        jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pool_ops
    ]
    out_specs = [pl.BlockSpec((1, Hkv, G, Dv), q_index)] + [any_spec] * n_pools
    # alias the trailing pool operands to the trailing outputs (operand
    # indices count the 3 scalar-prefetch args)
    first_pool_op = 3 + len(operands) - 3 - n_pools
    aliases = {first_pool_op + k: 1 + k for k in range(n_pools)}

    scratch = [
        pltpu.VMEM((Hkv, G, 1), jnp.float32),
        pltpu.VMEM((Hkv, G, 1), jnp.float32),
        pltpu.VMEM((Hkv, G, Dv), jnp.float32),
    ]
    for pool in pools:
        scratch.append(
            pltpu.VMEM((S, X) if wb_2d else (S, Hkv, stored), pool.dtype)
        )
    scratch.append(pltpu.SemaphoreType.DMA((n_pools,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_blocks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel_bs_fused,
        page_size=S,
        fetch_pages=FPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
        packed_dim=D if packed else 0,
        v_dim=v_dim,
        wb_2d=wb_2d,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(*operands)
    out = res[0].reshape(B, Hq, Dv)
    if single:
        return out, res[1].reshape(k_pages.shape), None
    return out, res[1].reshape(k_pages.shape), res[2].reshape(v_pages.shape)


@dedup_jit(4)
def paged_mla_decode(
    q_eff: jax.Array,  # [B, H, k_dim]: concat(absorbed q_latent, q_pe)
    latent_pool: jax.Array,  # [N_slots, stored] (lane-padded latent pool)
    page_tables: jax.Array,
    context_lens: jax.Array,
    page_size: int,
    scale: float,
    v_dim: int,  # kv_lora_rank: V = latent[..., :v_dim]
    interpret: bool = False,
    emit_partial: bool = False,
) -> jax.Array:
    """MLA absorbed-weight latent decode as single-"head" MQA (reference
    forward_compressed_cache + FlashMLA, multi_head_latent_attention.cpp).

    scores = q_eff . latent  (q zero-padded over the pool's lane padding, so
    the dot runs over the full stored width with no sub-lane slicing) and
    out_latent = softmax(scores) . latent[..., :v_dim] (128-aligned slice).
    Returns [B, H, v_dim].
    """
    B, H, k_dim = q_eff.shape
    N, stored = latent_pool.shape
    if k_dim < stored:
        q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, stored - k_dim)))
    if not emit_partial:
        # head-major path: [1, N, stored] is a FREE relayout of the 2-D pool
        # (leading unit dim), unlike [N, 1, stored] whose sublane-padded
        # tiling made XLA materialize a full pool copy per layer per step
        # (53.7 ms of a 197 ms DeepSeek-V2-Lite decode window, r5 profile) —
        # and the deep-fetch grid + M=H score dots come along for the ride
        from .attn_headmajor import paged_decode_attention_hm

        return paged_decode_attention_hm(
            q_eff,
            latent_pool[None],
            jnp.maximum(page_tables, 0),
            context_lens,
            page_size,
            scale,
            interpret=interpret,
            v_dim=v_dim,
        )
    q_g = q_eff.reshape(B, 1, H, stored)
    pool3 = latent_pool.reshape(N, 1, stored)
    out = _paged_decode_blockspec(
        q_g, pool3, pool3, jnp.maximum(page_tables, 0), context_lens,
        page_size, scale, 0, interpret, fetch_pages=8, v_dim=v_dim,
        emit_partial=emit_partial,
    )
    # [B, H, 128 + v_dim] fp32: lane 0 m, lane 1 l, [128:] unnormalized
    return out.reshape(B, H, v_dim + 128)


@dedup_jit(6)
def paged_mla_decode_fused(
    q_eff: jax.Array,        # [B, H, k_dim]: concat(absorbed q_latent, q_pe)
    latent_pool: jax.Array,  # [N_slots, stored]
    latent_new: jax.Array,   # [B, latent_dim] new rows (unpadded ok)
    slot_mapping: jax.Array, # [B]; <0 => skip write
    page_tables: jax.Array,
    context_lens: jax.Array, # [B] INCLUDING the current token
    page_size: int,
    scale: float,
    v_dim: int,
    interpret: bool = False,
):
    """Fused MLA latent decode: writes each sequence's latent row and attends
    (paged_mla_decode semantics) in one kernel. Returns (out [B, H, v_dim],
    latent_pool'); the pool is input_output-aliased (donate it)."""
    B, H, k_dim = q_eff.shape
    N, stored = latent_pool.shape
    if k_dim < stored:
        q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, stored - k_dim)))
    if latent_new.shape[1] < stored:
        latent_new = jnp.pad(
            latent_new, ((0, 0), (0, stored - latent_new.shape[1]))
        )
    out, pool, _ = paged_decode_attention_fused(
        q_eff,
        latent_pool.reshape(N, 1, stored),
        None,
        latent_new.reshape(B, 1, stored),
        latent_new.reshape(B, 1, stored),
        slot_mapping,
        page_tables,
        context_lens,
        page_size,
        scale,
        interpret=interpret,
        v_dim=v_dim,
    )
    return out.reshape(B, H, v_dim), pool.reshape(N, stored)


def _kernel_bs_q(
    # scalar prefetch
    page_tables_ref,
    context_lens_ref,
    # blocks: q, FPB k-pages (int8), FPB v-pages (int8), FPB k-scales, FPB v-scales
    *refs,
    page_size: int,
    fetch_pages: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
):
    """INT8-quantized KV variant (reference quantized-cache decode kernels,
    attention_kernel.cu quant_attention.cuh): per-(token, head) absmax scales,
    dequantized in VMEM right after the page fetch."""
    q_ref = refs[0]
    F = fetch_pages
    k_refs = refs[1 : 1 + F]
    v_refs = refs[1 + F : 1 + 2 * F]
    ks_refs = refs[1 + 2 * F : 1 + 3 * F]
    vs_refs = refs[1 + 3 * F : 1 + 4 * F]
    o_ref, m_ref, l_ref, acc_ref = refs[1 + 4 * F :]

    b = pl.program_id(0)
    i = pl.program_id(1)
    ctx = context_lens_ref[b]
    S, FPB = page_size, fetch_pages

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    num_valid_pages = pl.cdiv(ctx, S)

    @pl.when((i * FPB) < num_valid_pages)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [Hkv, G, D]
        Hkv = q.shape[0]
        kq = jnp.concatenate([r[:] for r in k_refs], axis=0).astype(jnp.float32)
        vq = jnp.concatenate([r[:] for r in v_refs], axis=0).astype(jnp.float32)
        ks = jnp.concatenate([r[:] for r in ks_refs], axis=0)  # [T, Hkv]
        vs = jnp.concatenate([r[:] for r in vs_refs], axis=0)
        kt = kq * ks[..., None]
        vt = vq * vs[..., None]
        if Hkv == 1:
            k2 = kt[:, 0]
            v2 = vt[:, 0]
            s = jax.lax.dot_general(
                q[0], k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            k = jnp.swapaxes(kt, 0, 1)
            v = jnp.swapaxes(vt, 0, 1)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        s = s * scale
        token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if Hkv == 1:
            upd = jax.lax.dot_general(
                p[0], v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )[None]
        else:
            upd = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-20)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@dedup_jit(7)
def paged_decode_attention_q(
    q: jax.Array,          # [B, Hq, D]
    k_pages: jax.Array,    # [N, Hkv, D] int8
    v_pages: jax.Array,
    k_scales: jax.Array,   # [N, Hkv] f32
    v_scales: jax.Array,
    page_tables: jax.Array,
    context_lens: jax.Array,
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    fetch_pages: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused decode attention over the INT8-quantized paged cache."""
    B, Hq, D = q.shape
    _, Hkv, _ = k_pages.shape
    S = page_size
    G = Hq // Hkv
    maxp = page_tables.shape[1]
    FPB = min(fetch_pages, maxp)
    num_blocks = (maxp + FPB - 1) // FPB
    q_g = q.reshape(B, Hkv, G, D)
    safe_tables = jnp.maximum(page_tables, 0)

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    def kv_index_at(j):
        def kv_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0, 0)

        return kv_index

    def sc_index_at(j):
        def sc_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0)

        return sc_index

    kv_specs = [pl.BlockSpec((S, Hkv, D), kv_index_at(j)) for j in range(FPB)]
    sc_specs = [pl.BlockSpec((S, Hkv), sc_index_at(j)) for j in range(FPB)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_blocks),
        in_specs=[pl.BlockSpec((1, Hkv, G, D), q_index)] + kv_specs + kv_specs + sc_specs + sc_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_bs_q,
        page_size=S,
        fetch_pages=FPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        safe_tables, context_lens, q_g,
        *([k_pages] * FPB), *([v_pages] * FPB),
        *([k_scales] * FPB), *([v_scales] * FPB),
    )
    return out.reshape(B, Hq, D)
