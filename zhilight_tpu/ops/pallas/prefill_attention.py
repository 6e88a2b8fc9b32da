"""Pallas TPU kernel: chunked-prefill flash attention over the paged pool.

Parity target: the reference's varlen flash-attention encode path
(src/nn/attention/attention.cpp:442-520 attn_encode_group,
src/nn/attention/flash_decoding.cpp:534) — prefill attention that streams the
KV context instead of materializing it. The previous TPU path gathered the
ENTIRE context into a contiguous ``[KV, H, D]`` buffer per layer per chunk and
ran O(T*KV) masked XLA attention with full score materialization
(``ops/attention.prefill_attention``); at 32k+ contexts that is quadratic HBM
traffic and dominates TTFT.

This kernel performs online-softmax attention for one prefill chunk directly
against the HEAD-MAJOR packed pool ``[Hkv, N_slots, 2D]`` (K|V lane-packed,
see ``kvcache/paged.py``), which already holds the chunk itself (the write
kernel runs first):

  * grid ``(head_blocks, num_q_blocks, num_kv_blocks)`` — each step runs
    BATCHED dots over ``HB`` kv heads at once, so one async copy per page
    covers all HB heads (the decode kernel's all-heads-per-descriptor
    pattern). The per-(head, page) 4 KB copies of the per-head variant were
    DMA-issue-bound ~14x under the HBM roofline at 3.7k context (profiled
    r4); batching heads into the descriptor recovers most of it.
  * q rows are grouped GQA queries: ``[HB, TQ*G, 2D]`` with the V-half lanes
    zeroed, so both dots stream the SAME fetched K|V buffer at full lane
    width (the head-major decode kernel's single-stream trick).
  * pages are DMAd ``pages_per_block`` at a time into a double-buffered VMEM
    scratch ``[2, HB, PPB*S, 2D]``.
  * causality bounds the kv loop per q block: blocks wholly after the last
    query of the block are neither computed nor fetched.
  * HB adapts to the fp32 score block ``[HB, TQ*G, PPB*S]`` VMEM budget, so
    short chunks (decode-heavy serving mixes) batch more heads and long
    chunks fall back toward per-head streaming with a single KV pass.

HBM traffic per chunk stays O(Hkv * num_q_blocks * ctx) with num_q_blocks
kept at 1 whenever the score budget allows (single context read).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dedup import dedup_jit

__all__ = [
    "paged_prefill_attention_hm",
    "paged_prefill_attention_hm_packed",
    "paged_prefill_attention_hm_q",
    "paged_prefill_attention_hm_packed_q",
]

NEG_INF = -2.0e38

# kv tokens per block (pages_per_block * page_size aims at this)
_KV_TOKENS_TARGET = 512
# scoped-VMEM limit for the kernel's live set (Mosaic's stack limit is
# 16 MB; leave headroom for the compiler's own temporaries — a 14 MB model
# still produced a 16.24 MB stack at the 14B single-seq chunk geometry)
_VMEM_LIMIT = 12 * 1024 * 1024


def _vmem_per_head(rows: int, ppb: int, S: int, D2: int) -> int:
    """Peak live bytes per batched head, from the observed failure modes:
    two fp32 [rows, ppb*S] score-class buffers (s and p coexist), the fp32
    accumulator, the (double-buffered) q/o blocks, and the two-slot kv
    scratch."""
    scores = 4 * rows * ppb * S
    acc = 4 * rows * D2
    qo = 2 * rows * D2 * 2  # q + o, storage dtype
    kv = 2 * ppb * S * D2 * 2
    return 2 * scores + acc + 2 * qo + kv


def _kernel_prefill_hm(
    # scalar prefetch
    page_table_ref,  # [NS, maxp] int32 (SMEM)
    meta_ref,        # [NS, 2] int32: (cache_len, q_len) per segment
    # inputs
    q_ref,    # [HB, TQ*G, 2D] VMEM (V-half lanes zero)
    kv_hbm,   # [Hkv, N_slots, 2D] ANY (HBM)
    # output
    o_ref,    # [HB, TQ*G, 2D] VMEM (V-half lanes carry the result)
    # scratch
    m_ref,    # [HB, TQ*G, 1] f32
    l_ref,    # [HB, TQ*G, 1] f32
    hi_ref,   # [HB, TQ*G, 1] i32 per-row exclusive visible-token bound
    acc_ref,  # [HB, TQ*G, 2D] f32
    kv_buf,   # [2, HB, PPB*S, 2D]
    sems,     # DMA semaphores [2, PPB]
    *,
    page_size: int,
    pages_per_block: int,
    num_blocks: int,
    tq: int,
    group: int,
    scale: float,
    sliding_window: int,
    q_blocks_per_seg: int,
    head_block: int,
):
    hb = pl.program_id(0)
    qg = pl.program_id(1)
    i = pl.program_id(2)
    S, PPB, HB = page_size, pages_per_block, head_block
    # packed multi-sequence chunk ("encode group", reference
    # fill_encode_input batch_generator.cpp:1086-1212): q rows are NS
    # segments of TC tokens each; q blocks never straddle segments
    # (tq divides TC), so each q block reads one segment's meta
    seg = qg // q_blocks_per_seg
    qi = qg % q_blocks_per_seg

    cache_len = meta_ref[seg, 0]
    q_len = meta_ref[seg, 1]
    total = cache_len + q_len
    num_valid_pages = pl.cdiv(total, S)

    # exclusive causal bound for this q block: its last query sits at global
    # position cache_len + min(q_len, (qi+1)*tq) - 1
    q_hi = cache_len + jnp.minimum(q_len, (qi + 1) * tq)
    q_active = (qi * tq) < q_len
    needed_blocks = jnp.where(q_active, pl.cdiv(q_hi, S * PPB), 0)

    def _block_active(blk):
        return blk < needed_blocks

    def _page_at(page_pos):
        # clamp so every DMA lands on real data (masked out of the softmax;
        # uninitialized VMEM would produce 0 * NaN in p @ v)
        safe_pos = jnp.minimum(page_pos, jnp.maximum(num_valid_pages - 1, 0))
        return page_table_ref[seg, safe_pos]

    def start_copies(block_idx, slot):
        # ONE descriptor per page covering all HB heads of this head block
        for j in range(PPB):
            page = _page_at(block_idx * PPB + j)
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(hb * HB, HB), pl.ds(page * S, S)],
                kv_buf.at[slot, :, pl.ds(j * S, S)],
                sems.at[slot, j],
            ).start()

    def wait_copies(block_idx, slot):
        for j in range(PPB):
            page = _page_at(block_idx * PPB + j)
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(hb * HB, HB), pl.ds(page * S, S)],
                kv_buf.at[slot, :, pl.ds(j * S, S)],
                sems.at[slot, j],
            ).wait()

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # per-row exclusive causal bound, hoisted out of the kv loop: row r
        # sees tokens [0, hi_r); padding rows (row_tok >= q_len) get hi = 0
        # (fully masked). The per-block mask then costs ONE iota + compare +
        # select instead of the 3-iota/4-compare chain (the elementwise pass
        # over the [HB, rows, PPB*S] score block dominates VPU time).
        row_tok = (
            qi * tq
            + jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1) // group
        )
        qpos = cache_len + row_tok
        hi = jnp.minimum(qpos + 1, total)
        hi_ref[...] = jnp.where(row_tok < q_len, hi, 0)

        @pl.when(_block_active(0))
        def _():
            start_copies(0, 0)

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(jnp.logical_and(i + 1 < num_blocks, _block_active(i + 1)))
    def _prefetch():
        start_copies(i + 1, next_slot)

    @pl.when(_block_active(i))
    def _compute():
        wait_copies(i, slot)
        q = q_ref[...]           # [HB, TQ*G, 2D] storage dtype, V lanes zero
        kv = kv_buf[slot]        # [HB, PPB*S, 2D]
        # scores contract the full packed width, BATCHED over the HB heads;
        # kv's V half meets q's zero lanes and drops out. bf16 MXU operands,
        # fp32 accumulation.
        s = jax.lax.dot_general(
            q, kv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                # [HB, TQ*G, PPB*S] fp32

        tok = i * (PPB * S) + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = tok < hi_ref[...]
        if sliding_window > 0:
            mask = jnp.logical_and(
                mask, tok >= hi_ref[...] - sliding_window
            )
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # p @ kv streams the same buffer; lanes [D:] accumulate sum(p * V)
        upd = jax.lax.dot_general(
            p.astype(kv.dtype), kv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                        # [HB, TQ*G, 2D] fp32
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-20)
        # full packed width out (K lanes are garbage, sliced off in XLA):
        # keeping the write lane-shaped avoids a VMEM relayout
        o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)


@dedup_jit(5)
def paged_prefill_attention_hm(
    q: jax.Array,           # [T, Hq, D] current chunk queries (post-rope)
    kv_pool: jax.Array,     # [Hkv, N_slots, 2D] head-major K|V packed pool
    page_table: jax.Array,  # [maxp] int32 pages of this sequence; -1 pad
    cache_len: jax.Array,   # scalar int32: tokens before this chunk
    q_len: jax.Array,       # scalar int32: valid tokens in chunk (<= T)
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Flash chunked-prefill attention for ONE sequence; returns [T, Hq, D]
    like ``ops.attention.prefill_attention`` (pool must already contain the
    chunk's K/V — the write kernel runs first, matching the XLA ordering)."""
    return paged_prefill_attention_hm_packed(
        q,
        kv_pool,
        page_table[None],
        jnp.asarray(cache_len, jnp.int32).reshape(1),
        jnp.asarray(q_len, jnp.int32).reshape(1),
        page_size,
        scale,
        sliding_window,
        interpret,
    )


@dedup_jit(5)
def paged_prefill_attention_hm_packed(
    q: jax.Array,            # [T, Hq, D]; T = NS * TC packed segment tokens
    kv_pool: jax.Array,      # [Hkv, N_slots, 2D] head-major K|V packed pool
    page_tables: jax.Array,  # [NS, maxp] int32 pages per segment; -1 pad
    cache_lens: jax.Array,   # [NS] int32: tokens before each segment's chunk
    q_lens: jax.Array,       # [NS] int32 valid tokens per segment (<= TC)
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Multi-sequence packed prefill (reference "encode group",
    src/generator/batch_generator.cpp:1086-1212): NS independent chunks share
    one fused program — the MLP/projection matmuls see one [NS*TC] token
    batch while attention masks per segment. Returns [T, Hq, D]."""
    T, Hq, D = q.shape
    Hkv, N, D2 = kv_pool.shape
    assert D2 == 2 * D, (D2, D)
    S = page_size
    G = Hq // Hkv
    NS, maxp = page_tables.shape
    assert T % NS == 0, (T, NS)
    TC = T // NS

    # Tiling policy, in priority order:
    #   1. ONE q block per segment (tq = TC => single KV pass, no row pad) —
    #      shrink the kv block (ppb) until the per-head live set fits;
    #   2. only split q when even a 4-page kv block cannot fit (huge TC*G);
    #   3. batch as many kv heads per grid step (and per DMA descriptor) as
    #      the remaining VMEM affords.
    # A q-split costs KV re-reads AND padded rows (tc_pad > TC inflates every
    # block tenant), so it is the last resort.
    tq = max(8, min(TC, max(8, (8192 // G) // 8 * 8)) // 8 * 8)
    ppb = max(1, min(maxp, _KV_TOKENS_TARGET // S))
    while ppb > 4 and _vmem_per_head(tq * G, ppb, S, D2) > _VMEM_LIMIT:
        ppb -= 1
    while tq > 8 and _vmem_per_head(tq * G, ppb, S, D2) > _VMEM_LIMIT:
        tq = max(8, tq // 2 // 8 * 8)
    num_blocks = (maxp + ppb - 1) // ppb
    ppb = (maxp + num_blocks - 1) // num_blocks  # fit tightly (decode's trick)
    tc_pad = (TC + tq - 1) // tq * tq  # per-seg row pad; multiple of tq
    q_blocks_per_seg = tc_pad // tq
    num_q_blocks = NS * q_blocks_per_seg

    per_head = _vmem_per_head(tq * G, ppb, S, D2)
    HB = 1
    for cand in range(1, Hkv + 1):
        if Hkv % cand == 0 and cand * per_head <= _VMEM_LIMIT:
            HB = cand
    num_head_blocks = Hkv // HB

    # [T, Hq, D] -> [Hkv, T*G, D] -> per-seg row pad + lane pad; V lanes zero
    q_hm = jnp.moveaxis(q.reshape(T, Hkv, G, D), 1, 0).reshape(Hkv, NS, TC * G, D)
    q_hm = jnp.pad(q_hm, ((0, 0), (0, 0), (0, (tc_pad - TC) * G), (0, D2 - D)))
    q_hm = q_hm.reshape(Hkv, NS * tc_pad * G, D2)

    safe_tables = jnp.maximum(page_tables, 0)
    meta = jnp.stack(
        [jnp.asarray(cache_lens, jnp.int32), jnp.asarray(q_lens, jnp.int32)], axis=1
    )  # [NS, 2]

    def q_index(hb, qg, i, *_):
        return (hb, qg, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_head_blocks, num_q_blocks, num_blocks),
        in_specs=[
            pl.BlockSpec((HB, tq * G, D2), q_index),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((HB, tq * G, D2), q_index),
        scratch_shapes=[
            pltpu.VMEM((HB, tq * G, 1), jnp.float32),
            pltpu.VMEM((HB, tq * G, 1), jnp.float32),
            pltpu.VMEM((HB, tq * G, 1), jnp.int32),
            pltpu.VMEM((HB, tq * G, D2), jnp.float32),
            pltpu.VMEM((2, HB, ppb * S, D2), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((2, ppb)),
        ],
    )
    kernel = functools.partial(
        _kernel_prefill_hm,
        page_size=S,
        pages_per_block=ppb,
        num_blocks=num_blocks,
        tq=tq,
        group=G,
        scale=scale,
        sliding_window=sliding_window,
        q_blocks_per_seg=q_blocks_per_seg,
        head_block=HB,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, NS * tc_pad * G, D2), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(safe_tables, meta, q_hm, kv_pool)
    # V lanes carry the result: [Hkv, NS*tc_pad*G, 2D] -> [T, Hq, D]
    out = out.reshape(Hkv, NS, tc_pad * G, D2)[:, :, : TC * G, D:]
    out = out.reshape(Hkv, T, G, D)
    return jnp.moveaxis(out, 0, 1).reshape(T, Hq, D)


# ---------------------------------------------------------------------------
# INT8-quantized variant (reference quantized-cache prefill,
# src/nn/attention/quant_attention.cuh + attention_kernel.cu:539-1100): same
# head-blocked flash structure over the int8 head-major packed pool. The
# slot-major per-(token, head) absmax scales [N, Hkv] are pre-blocked in XLA
# to [num_head_blocks, N/S, HB, S] (one ~1 MB relayout per layer per chunk)
# so the kernel fetches each page's scale tile as a plain BlockSpec operand:
# the tiled dims (HB, S) are full-extent, which sidesteps Mosaic's DMA
# slicing rules (lane-dim slices must be 128-aligned; a [S, HB] column slice
# of [N, Hkv] is rejected on real hardware). Scales never touch the K/V
# elements: the K scale folds into the SCORES and the V scale into the
# probabilities before the second dot (the decode _q kernel's trick) — the
# int8 buffer feeds the MXU directly at half the bf16 HBM bytes. This was
# the r4 "int8 KV loses" gap: prefill fell back to gather+dequant XLA
# attention and burned TTFT (PROFILES r4:150-157).
# ---------------------------------------------------------------------------

def _kernel_prefill_hm_q(
    # scalar prefetch
    page_table_ref,  # [NS, maxp]
    meta_ref,        # [NS, 2]
    # inputs
    *refs,
    page_size: int,
    pages_per_block: int,
    num_blocks: int,
    tq: int,
    group: int,
    scale: float,
    sliding_window: int,
    q_blocks_per_seg: int,
    head_block: int,
):
    S, PPB, HB = page_size, pages_per_block, head_block
    q_ref = refs[0]                      # [HB, TQ*G, 2D] VMEM (V lanes zero)
    kv_hbm = refs[1]                     # [Hkv, N_slots, 2D] ANY int8
    ks_refs = refs[2 : 2 + PPB]          # each [1, 1, HB, S] f32 (BlockSpec)
    vs_refs = refs[2 + PPB : 2 + 2 * PPB]
    o_ref, m_ref, l_ref, hi_ref, acc_ref, kv_buf, sems = refs[2 + 2 * PPB :]

    hb = pl.program_id(0)
    qg = pl.program_id(1)
    i = pl.program_id(2)
    seg = qg // q_blocks_per_seg
    qi = qg % q_blocks_per_seg

    cache_len = meta_ref[seg, 0]
    q_len = meta_ref[seg, 1]
    total = cache_len + q_len
    num_valid_pages = pl.cdiv(total, S)

    q_hi = cache_len + jnp.minimum(q_len, (qi + 1) * tq)
    q_active = (qi * tq) < q_len
    needed_blocks = jnp.where(q_active, pl.cdiv(q_hi, S * PPB), 0)

    def _block_active(blk):
        return blk < needed_blocks

    def _page_at(page_pos):
        safe_pos = jnp.minimum(page_pos, jnp.maximum(num_valid_pages - 1, 0))
        return page_table_ref[seg, safe_pos]

    def _copies(block_idx, slot):
        out = []
        for j in range(PPB):
            page = _page_at(block_idx * PPB + j)
            out.append(pltpu.make_async_copy(
                kv_hbm.at[pl.ds(hb * HB, HB), pl.ds(page * S, S)],
                kv_buf.at[slot, :, pl.ds(j * S, S)],
                sems.at[slot, j],
            ))
        return out

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        row_tok = (
            qi * tq
            + jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1) // group
        )
        qpos = cache_len + row_tok
        hi = jnp.minimum(qpos + 1, total)
        hi_ref[...] = jnp.where(row_tok < q_len, hi, 0)

        @pl.when(_block_active(0))
        def _():
            for cp in _copies(0, 0):
                cp.start()

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(jnp.logical_and(i + 1 < num_blocks, _block_active(i + 1)))
    def _prefetch():
        for cp in _copies(i + 1, next_slot):
            cp.start()

    @pl.when(_block_active(i))
    def _compute():
        for cp in _copies(i, slot):
            cp.wait()
        q = q_ref[...]           # [HB, TQ*G, 2D] bf16, V lanes zero
        kv = kv_buf[slot]        # [HB, PPB*S, 2D] int8 -> MXU direct
        # scale tiles arrive pre-blocked [HB, S]; concatenate the block's
        # pages along lanes -> [HB, 1, PPB*S], no transpose in-kernel
        ks_h = jnp.concatenate([r[0, 0] for r in ks_refs], axis=-1)[:, None, :]
        vs_h = jnp.concatenate([r[0, 0] for r in vs_refs], axis=-1)[:, None, :]
        s = jax.lax.dot_general(
            q, kv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s * ks_h             # K dequant folded into the scores

        tok = i * (PPB * S) + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = tok < hi_ref[...]
        if sliding_window > 0:
            mask = jnp.logical_and(mask, tok >= hi_ref[...] - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        upd = jax.lax.dot_general(
            (p * vs_h).astype(q.dtype), kv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                        # V dequant via p
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-20)
        o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)


@dedup_jit(7)
def paged_prefill_attention_hm_packed_q(
    q: jax.Array,            # [T, Hq, D]; T = NS * TC packed segment tokens
    kv_pool: jax.Array,      # [Hkv, N_slots, 2D] head-major K|V packed int8
    k_scales: jax.Array,     # [N_slots, Hkv] f32 per-(token, head) absmax
    v_scales: jax.Array,
    page_tables: jax.Array,  # [NS, maxp]
    cache_lens: jax.Array,   # [NS]
    q_lens: jax.Array,       # [NS]
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Multi-sequence packed flash prefill over the INT8 pool; same geometry
    policy as the bf16 kernel plus per-page scale tiles."""
    T, Hq, D = q.shape
    Hkv, N, D2 = kv_pool.shape
    assert D2 == 2 * D, (D2, D)
    S = page_size
    G = Hq // Hkv
    NS, maxp = page_tables.shape
    assert T % NS == 0, (T, NS)
    TC = T // NS

    tq = max(8, min(TC, max(8, (8192 // G) // 8 * 8)) // 8 * 8)
    ppb = max(1, min(maxp, _KV_TOKENS_TARGET // S))

    def _vmem_q(rows, ppb):
        # int8 kv halves the kv scratch vs the bf16 model, but the scale
        # folds add a third live score-class buffer (s, p and p*vs coexist)
        return (
            _vmem_per_head(rows, ppb, S, D2)
            + 4 * rows * ppb * S
            - 2 * ppb * S * D2
        )

    # the int8 body's compiler temporaries run ~5 MB past the analytic model
    # at the 14B packed shape (17.07M real vs ~12M modeled — Mosaic stack
    # OOM on chip), so this variant budgets against a smaller limit
    _Q_LIMIT = 8 * 1024 * 1024
    while ppb > 2 and _vmem_q(tq * G, ppb) > _Q_LIMIT:
        ppb -= 1
    while tq > 8 and _vmem_q(tq * G, ppb) > _Q_LIMIT:
        tq = max(8, tq // 2 // 8 * 8)
    num_blocks = (maxp + ppb - 1) // ppb
    ppb = (maxp + num_blocks - 1) // num_blocks
    tc_pad = (TC + tq - 1) // tq * tq
    q_blocks_per_seg = tc_pad // tq
    num_q_blocks = NS * q_blocks_per_seg

    per_head = _vmem_q(tq * G, ppb)
    HB = 1
    for cand in range(1, Hkv + 1):
        scale_tiles = 2 * 2 * ppb * cand * S * 4  # double-buffered by Mosaic
        if Hkv % cand == 0 and cand * per_head + scale_tiles <= _Q_LIMIT:
            HB = cand
    num_head_blocks = Hkv // HB

    q_hm = jnp.moveaxis(q.reshape(T, Hkv, G, D), 1, 0).reshape(Hkv, NS, TC * G, D)
    q_hm = jnp.pad(q_hm, ((0, 0), (0, 0), (0, (tc_pad - TC) * G), (0, D2 - D)))
    q_hm = q_hm.reshape(Hkv, NS * tc_pad * G, D2)

    # pre-block the scales: [N, Hkv] -> [num_hb, N/S, HB, S]; the kernel's
    # scale operands then slice only untiled leading dims
    NP = N // S

    def _block_scales(sc):
        return jnp.transpose(
            sc.reshape(NP, S, num_head_blocks, HB), (2, 0, 3, 1)
        )

    ks_b = _block_scales(k_scales)
    vs_b = _block_scales(v_scales)

    safe_tables = jnp.maximum(page_tables, 0)
    meta = jnp.stack(
        [jnp.asarray(cache_lens, jnp.int32), jnp.asarray(q_lens, jnp.int32)], axis=1
    )

    def q_index(hb, qg, i, *_):
        return (hb, qg, 0)

    def sc_index_at(j):
        def sc_index(hb, qg, i, pt_ref, meta_ref):
            seg = qg // q_blocks_per_seg
            cache_len = meta_ref[seg, 0]
            total = cache_len + meta_ref[seg, 1]
            nvp = pl.cdiv(total, S)
            pos = i * ppb + j
            safe = jnp.minimum(pos, jnp.maximum(nvp - 1, 0))
            return (hb, pt_ref[seg, safe], 0, 0)

        return sc_index

    sc_specs = [
        pl.BlockSpec((1, 1, HB, S), sc_index_at(j)) for j in range(ppb)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_head_blocks, num_q_blocks, num_blocks),
        in_specs=[
            pl.BlockSpec((HB, tq * G, D2), q_index),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + sc_specs + sc_specs,
        out_specs=pl.BlockSpec((HB, tq * G, D2), q_index),
        scratch_shapes=[
            pltpu.VMEM((HB, tq * G, 1), jnp.float32),
            pltpu.VMEM((HB, tq * G, 1), jnp.float32),
            pltpu.VMEM((HB, tq * G, 1), jnp.int32),
            pltpu.VMEM((HB, tq * G, D2), jnp.float32),
            pltpu.VMEM((2, HB, ppb * S, D2), kv_pool.dtype),
            pltpu.SemaphoreType.DMA((2, ppb)),
        ],
    )
    kernel = functools.partial(
        _kernel_prefill_hm_q,
        page_size=S,
        pages_per_block=ppb,
        num_blocks=num_blocks,
        tq=tq,
        group=G,
        scale=scale,
        sliding_window=sliding_window,
        q_blocks_per_seg=q_blocks_per_seg,
        head_block=HB,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, NS * tc_pad * G, D2), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(safe_tables, meta, q_hm, kv_pool, *([ks_b] * ppb), *([vs_b] * ppb))
    out = out.reshape(Hkv, NS, tc_pad * G, D2)[:, :, : TC * G, D:]
    out = out.reshape(Hkv, T, G, D)
    return jnp.moveaxis(out, 0, 1).reshape(T, Hq, D)


@dedup_jit(7)
def paged_prefill_attention_hm_q(
    q: jax.Array,
    kv_pool: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    page_table: jax.Array,  # [maxp]
    cache_len: jax.Array,
    q_len: jax.Array,
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Single-sequence int8 chunked-prefill flash attention."""
    return paged_prefill_attention_hm_packed_q(
        q,
        kv_pool,
        k_scales,
        v_scales,
        page_table[None],
        jnp.asarray(cache_len, jnp.int32).reshape(1),
        jnp.asarray(q_len, jnp.int32).reshape(1),
        page_size,
        scale,
        sliding_window,
        interpret,
    )
