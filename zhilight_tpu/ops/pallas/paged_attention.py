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

__all__ = ["paged_decode_attention", "paged_mla_decode", "paged_decode_attention_q"]

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
        l = jnp.maximum(l_ref[...], 1e-20)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _paged_decode_blockspec(
    q_g,  # [B, Hkv, G, D]
    k_pages, v_pages, safe_tables, context_lens, page_size, scale,
    sliding_window, interpret, fetch_pages=8, packed=False, v_dim=0,
):
    B, Hkv, G, D = q_g.shape
    S = page_size
    maxp = safe_tables.shape[1]
    FPB = min(fetch_pages, maxp)
    num_blocks = (maxp + FPB - 1) // FPB
    stored = k_pages.shape[-1]  # 2D when packed; latent width in MLA mode
    Dv = v_dim if v_dim else D

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
        out_specs=pl.BlockSpec((1, Hkv, G, Dv), q_index),
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
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Dv), q_g.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


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


def paged_mla_decode(
    q_eff: jax.Array,  # [B, H, k_dim]: concat(absorbed q_latent, q_pe)
    latent_pool: jax.Array,  # [N_slots, stored] (lane-padded latent pool)
    page_tables: jax.Array,
    context_lens: jax.Array,
    page_size: int,
    scale: float,
    v_dim: int,  # kv_lora_rank: V = latent[..., :v_dim]
    interpret: bool = False,
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
    q_g = q_eff.reshape(B, 1, H, stored)
    pool3 = latent_pool.reshape(N, 1, stored)
    out = _paged_decode_blockspec(
        q_g, pool3, pool3, jnp.maximum(page_tables, 0), context_lens,
        page_size, scale, 0, interpret, fetch_pages=8, v_dim=v_dim,
    )
    return out.reshape(B, H, v_dim)


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
