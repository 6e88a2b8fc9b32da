"""Pallas TPU kernel: paged decode attention over a HEAD-MAJOR packed pool.

Candidate replacement for the slot-major packed kernel
(paged_attention._kernel_bs): the pool is ``[Hkv, N_slots, 2D]`` (K|V
lane-packed), so a fetched page block arrives ``[Hkv, S, 2D]`` — already
batch-leading for Mosaic's batched ``dot_general``, removing the per-block
``swapaxes`` relayout that dominates the slot-major kernel's device time.

Both matmuls stream the SAME fetched buffer at full lane width:

  q_eff = [q | 0]                  # zero lanes over the V half
  s     = q_eff @ kv^T             # = q . K   (V half hits zeros)
  out   = p @ kv                   # [.. | sum p*V] — take the V lanes

so K and V are read once from VMEM with no lane slicing before the dots
(reference fused decode kernels read K/V twice from separate buffers;
attention_kernel.cu:539-1100).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._dedup import dedup_jit

__all__ = ["paged_decode_attention_hm", "paged_decode_attention_hm_q"]

NEG_INF = -2.0e38


def _deep_fpb(maxp: int, page_bytes: int, fetch_pages, ops_per_page: int = 1) -> int:
    """Pages per fetch group. ``fetch_pages=None`` (the default path) fills a
    VMEM budget instead of a fixed count: fewer, larger fetch groups keep the
    DMA engines streaming. Measured on v5e at the MiniCPM bench geometry
    (36 MHA heads, ctx 512, S=16): fp=8 466 GB/s wall vs fp=maxp 533 GB/s
    (tools/probe_decode_bw.py). The budget covers ONE fetch group; Mosaic
    double-buffers it, so VMEM use is ~2x this plus q/out/scratch."""
    if fetch_pages is not None:
        return min(fetch_pages, maxp)
    budget = int(os.environ.get("ZT_DECODE_FETCH_BYTES", 5 << 20))
    # operand-count cap: every fetched page is its own BlockSpec operand and
    # Mosaic lowering degrades superlinearly past ~copies*2 per grid step
    # (a 182-operand MLA variant did not finish compiling in 20 min)
    cap = int(os.environ.get("ZT_DECODE_FETCH_MAX_PAGES", 48)) // ops_per_page
    return max(1, min(maxp, cap, budget // max(page_bytes, 1)))


def _kernel_hm(
    # scalar prefetch
    page_tables_ref,   # [B, maxp]
    context_lens_ref,  # [B]
    # blocks
    *refs,
    page_size: int,
    fetch_pages: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
    packed_dim: int,   # D (V half starts here)
    emit_partial: bool = False,
    v_dim: int = 0,    # MLA latent mode: V = kv[..., :v_dim], scores over
                       # the full stored width (Hkv=1, G=num_heads)
):
    q_ref = refs[0]                       # [1, Hkv, G, 2D] (q zero-padded)
    kv_refs = refs[1 : 1 + fetch_pages]   # each [Hkv, S, 2D]
    o_ref, m_ref, l_ref, acc_ref = refs[1 + fetch_pages :]  # o: [1,Hkv,G,D]

    b = pl.program_id(0)
    i = pl.program_id(1)
    ctx = context_lens_ref[b]
    S, FPB = page_size, fetch_pages
    D2 = packed_dim * 2

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    num_valid_pages = pl.cdiv(ctx, S)

    @pl.when((i * FPB) < num_valid_pages)
    def _compute():
        q = q_ref[0]                      # [Hkv, G, 2D] (upper D lanes zero)
        kv = jnp.concatenate([r[:] for r in kv_refs], axis=1)  # [Hkv, T, 2D]
        # scores: batched over heads, contract the full packed width — the
        # V half of kv meets q's zero lanes and drops out. Operands stay in
        # the storage dtype (bf16 MXU passes; fp32 operands run the MXU ~8x
        # slower) with fp32 accumulation.
        s = jax.lax.dot_general(
            q,
            kv,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                          # [Hkv, G, T] fp32
        token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=2
        )
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # p @ kv streams the same buffer; lanes [D:] accumulate sum(p * V).
        # p is cast to the storage dtype for the MXU (standard flash-
        # attention practice; exact when the inputs are fp32, e.g. tests)
        upd = jax.lax.dot_general(
            p.astype(kv.dtype),
            kv,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                  # [Hkv, G, 2D] fp32
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        if emit_partial:
            # flash-partial output for XLA-side merging with out-of-pool rows
            # (decode-window side buffer): V-half lanes carry the UNNORMALIZED
            # accumulator; the otherwise-unused K-half lanes carry the running
            # max (lane 0) and normalizer (lane 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 2)
            out = jnp.where(
                lane == 0,
                m_ref[...],
                jnp.where(lane == 1, l_ref[...], acc_ref[...]),
            )
            o_ref[0] = out.astype(o_ref.dtype)
        else:
            l = jnp.maximum(l_ref[...], 1e-20)
            # emit only the V lanes — slicing here (VMEM, free) instead of in
            # XLA saved ~40 async device slices per decode step
            if v_dim:
                o_ref[0] = ((acc_ref[...] / l)[..., :v_dim]).astype(o_ref.dtype)
            else:
                o_ref[0] = ((acc_ref[...] / l)[..., packed_dim:]).astype(o_ref.dtype)


@dedup_jit(4)
def paged_decode_attention_hm(
    q: jax.Array,         # [B, Hq, D]
    kv_pool: jax.Array,   # [Hkv, N_slots, 2D] head-major K|V packed
    page_tables: jax.Array,
    context_lens: jax.Array,
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    fetch_pages: int | None = None,
    interpret: bool = False,
    emit_partial: bool = False,
    v_dim: int = 0,
) -> jax.Array:
    """Normalized attention output [B, Hq, D], or with ``emit_partial`` the
    flash partials [B, Hkv, G, 2D] fp32 (lane 0 = running max, lane 1 =
    normalizer, lanes [D:] = unnormalized V accumulator) for exact XLA-side
    merging with rows not yet in the pool (decode-window side buffer).

    ``v_dim`` > 0 selects MLA latent mode (reference absorbed-weight
    compressed-cache decode, multi_head_latent_attention.cpp): the pool is
    ``[1, N, stored]`` latents, q is ``[B, H, stored]`` (caller-padded),
    scores contract the full stored width and V is the ``[:v_dim]`` prefix;
    returns [B, H, v_dim]."""
    assert not (emit_partial and v_dim), "MLA partials use the BlockSpec path"
    B, Hq, D = q.shape
    Hkv, N, D2 = kv_pool.shape
    S = page_size
    G = Hq // Hkv
    maxp = page_tables.shape[1]
    FPB = _deep_fpb(maxp, Hkv * S * D2 * kv_pool.dtype.itemsize, fetch_pages)
    num_blocks = (maxp + FPB - 1) // FPB
    # shrink the per-block page count to fit maxp tightly: fetches happen for
    # every grid block (clamped pages are masked but still move bytes), so
    # e.g. maxp=34 with FPB=8 reads 40 page-slots/seq where FPB=7 reads 35
    FPB = (maxp + num_blocks - 1) // num_blocks

    # zero-pad q over the V lanes so the score dot runs the full packed width
    q_g = jnp.pad(q.reshape(B, Hkv, G, D), ((0, 0), (0, 0), (0, 0), (0, D2 - D)))
    safe_tables = jnp.maximum(page_tables, 0)

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    def kv_index_at(j):
        def kv_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (0, page, 0)

        return kv_index

    kv_specs = [pl.BlockSpec((Hkv, S, D2), kv_index_at(j)) for j in range(FPB)]
    out_dim = D2 if emit_partial else (v_dim if v_dim else D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_blocks),
        in_specs=[pl.BlockSpec((1, Hkv, G, D2), q_index)] + kv_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, out_dim), q_index),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, D2), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_hm,
        page_size=S,
        fetch_pages=FPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
        packed_dim=D,
        emit_partial=emit_partial,
        v_dim=v_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, Hkv, G, out_dim), jnp.float32 if emit_partial else q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(safe_tables, context_lens, q_g, *([kv_pool] * FPB))
    if emit_partial:
        return out
    return out.reshape(B, Hq, out_dim)


# ---------------------------------------------------------------------------
# INT8-quantized variant (reference quant_attention.cuh int8 cache decode):
# same head-major packed pool geometry but int8 elements, with the existing
# slot-major per-(token, head) absmax scales [N, Hkv]. Scales never touch the
# K/V elements: the K scale folds into the SCORES (s[t] *= ks[t]) and the V
# scale into the probabilities (p[t] *= vs[t]) before the second dot — O(T)
# work instead of O(T*2D) row dequantization, and the kernel still streams
# the fetched buffer once at half the bf16 HBM bytes.
# ---------------------------------------------------------------------------

def _kernel_hm_q(
    # scalar prefetch
    page_tables_ref,   # [B, maxp]
    context_lens_ref,  # [B]
    # blocks
    *refs,
    page_size: int,
    fetch_pages: int,
    num_blocks: int,
    scale: float,
    sliding_window: int,
    packed_dim: int,
    emit_partial: bool = False,
):
    F = fetch_pages
    q_ref = refs[0]                     # [1, Hkv, G, 2D] (q zero-padded)
    kv_refs = refs[1 : 1 + F]           # each [Hkv, S, 2D] int8
    ks_refs = refs[1 + F : 1 + 2 * F]   # each [S, Hkv] f32
    vs_refs = refs[1 + 2 * F : 1 + 3 * F]
    o_ref, m_ref, l_ref, acc_ref = refs[1 + 3 * F :]

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
        q = q_ref[0]                                            # [Hkv, G, 2D]
        kv = jnp.concatenate([r[:] for r in kv_refs], axis=1)   # [Hkv, T, 2D] i8
        ks = jnp.concatenate([r[:] for r in ks_refs], axis=0)   # [T, Hkv] f32
        vs = jnp.concatenate([r[:] for r in vs_refs], axis=0)
        ks_h = jnp.swapaxes(ks, 0, 1)[:, None, :]               # [Hkv, 1, T]
        vs_h = jnp.swapaxes(vs, 0, 1)[:, None, :]
        # MIXED bf16 x int8 MXU dots: the int8 buffer goes straight to the
        # MXU (v5e ingests weight operands at a fixed byte rate, so int8
        # halves both dot passes) — no per-element dequant cast, which was
        # the dominant cost of this kernel (cast + bf16-ingest measured
        # SLOWER than the bf16 kernel at half the HBM bytes)
        s = jax.lax.dot_general(
            q, kv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                               # [Hkv, G, T]
        s = s * ks_h                                            # K dequant
        token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=2
        )
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        upd = jax.lax.dot_general(
            (p * vs_h).astype(q.dtype), kv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                       # V dequant via p
        acc_ref[...] = acc_ref[...] * alpha + upd
        m_ref[...] = m_new

    @pl.when(i == num_blocks - 1)
    def _finish():
        if emit_partial:
            lane = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 2)
            out = jnp.where(
                lane == 0,
                m_ref[...],
                jnp.where(lane == 1, l_ref[...], acc_ref[...]),
            )
            o_ref[0] = out.astype(o_ref.dtype)
        else:
            l = jnp.maximum(l_ref[...], 1e-20)
            o_ref[0] = ((acc_ref[...] / l)[..., packed_dim:]).astype(o_ref.dtype)


@dedup_jit(6)
def paged_decode_attention_hm_q(
    q: jax.Array,          # [B, Hq, D]
    kv_pool: jax.Array,    # [Hkv, N_slots, 2D] head-major K|V packed, int8
    k_scales: jax.Array,   # [N_slots, Hkv] f32 per-(token, head) absmax
    v_scales: jax.Array,
    page_tables: jax.Array,
    context_lens: jax.Array,
    page_size: int,
    scale: float,
    sliding_window: int = 0,
    fetch_pages: int | None = None,
    interpret: bool = False,
    emit_partial: bool = False,
) -> jax.Array:
    B, Hq, D = q.shape
    Hkv, N, D2 = kv_pool.shape
    S = page_size
    G = Hq // Hkv
    maxp = page_tables.shape[1]
    # int8 pool: the scale operands add 2 * S * Hkv * 4 B per page, and each
    # page costs THREE BlockSpec operands (kv + k/v scales) against the
    # Mosaic lowering-complexity cap
    FPB = _deep_fpb(
        maxp,
        Hkv * S * D2 * kv_pool.dtype.itemsize + 2 * S * Hkv * 4,
        fetch_pages,
        ops_per_page=3,
    )
    num_blocks = (maxp + FPB - 1) // FPB
    FPB = (maxp + num_blocks - 1) // num_blocks
    out_dim = D2 if emit_partial else D

    q_g = jnp.pad(q.reshape(B, Hkv, G, D), ((0, 0), (0, 0), (0, 0), (0, D2 - D)))
    safe_tables = jnp.maximum(page_tables, 0)

    def q_index(b, i, *_):
        return (b, 0, 0, 0)

    def kv_index_at(j):
        def kv_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (0, page, 0)

        return kv_index

    def sc_index_at(j):
        def sc_index(b, i, page_tables_ref, context_lens_ref):
            ctx = context_lens_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = page_tables_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0)

        return sc_index

    kv_specs = [pl.BlockSpec((Hkv, S, D2), kv_index_at(j)) for j in range(FPB)]
    sc_specs = [pl.BlockSpec((S, Hkv), sc_index_at(j)) for j in range(FPB)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, num_blocks),
        in_specs=[pl.BlockSpec((1, Hkv, G, D2), q_index)]
        + kv_specs + sc_specs + sc_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, out_dim), q_index),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, D2), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_hm_q,
        page_size=S,
        fetch_pages=FPB,
        num_blocks=num_blocks,
        scale=scale,
        sliding_window=sliding_window,
        packed_dim=D,
        emit_partial=emit_partial,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, Hkv, G, out_dim), jnp.float32 if emit_partial else q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        safe_tables, context_lens, q_g,
        *([kv_pool] * FPB), *([k_scales] * FPB), *([v_scales] * FPB),
    )
    if emit_partial:
        return out
    return out.reshape(B, Hq, D)
