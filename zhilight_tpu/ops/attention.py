"""Attention computations (XLA-native paths).

Functional parity targets in the reference:
  - prefill: flash-attn varlen / naive masked fallback
    (src/nn/attention/attention.cpp:442+, attn_encode_group)
  - decode: fused batch MQA/GQA kernels over ragged buffers
    (src/nn/attention/attention_kernel.cu KERNEL_mqa_rag_buffer family)

These jnp implementations are the correctness reference and the CPU-test path;
``ops/pallas/paged_attention.py`` provides the production TPU decode kernel
with the same semantics. Softmax is always computed in fp32 (reference
HIGH_PRECISION / attention_softmax_kernel.cu behavior).

Conventions: q heads [T, Hq, D]; kv gathered to [T_kv, Hkv, D] (single seq,
prefill) or [B, KV, Hkv, D] (decode); GQA via head-group reshape, no
materialized kv repeat.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["prefill_attention", "decode_attention"]

NEG_INF = -2.0e38


def _group_heads(q: jax.Array, num_kv_heads: int) -> jax.Array:
    """[..., Hq, D] -> [..., Hkv, G, D]"""
    *lead, hq, d = q.shape
    return q.reshape(*lead, num_kv_heads, hq // num_kv_heads, d)


def prefill_attention(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [KV, Hkv, D]  (cached prefix + current chunk, contiguous)
    v: jax.Array,  # [KV, Hkv, Dv]
    cache_len: jax.Array,  # scalar int32: tokens before this chunk
    q_len: jax.Array,  # scalar int32: valid tokens in chunk (<= T)
    scale: float,
    sliding_window: int = 0,
) -> jax.Array:
    """Causal chunk attention against a contiguous context.

    Query token i sits at global position cache_len + i and may attend to
    context positions j <= cache_len + i (with optional sliding window).
    Padding (i >= q_len or j >= cache_len + q_len) is masked out.
    Returns [T, Hq, Dv].
    """
    T, Hq, D = q.shape
    KV, Hkv, Dv = v.shape
    qg = _group_heads(q, Hkv)  # [T, Hkv, G, D]

    scores = jnp.einsum(
        "tkgd,skd->kgts", qg, k, preferred_element_type=jnp.float32
    )  # [Hkv, G, T, KV]
    scores = scores * scale

    q_pos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (T, KV), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (T, KV), 1)
    mask = k_pos <= q_pos
    mask &= k_pos < (cache_len + q_len)
    if sliding_window > 0:
        mask &= k_pos > (q_pos - sliding_window)
    scores = jnp.where(mask[None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "kgts,skd->tkgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(T, Hq, Dv).astype(q.dtype)


def decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k: jax.Array,  # [B, KV, Hkv, D]
    v: jax.Array,  # [B, KV, Hkv, Dv]
    context_lens: jax.Array,  # [B] int32, includes current token
    scale: float,
    sliding_window: int = 0,
) -> jax.Array:
    """Single-token batched decode attention over gathered paged context.

    Semantics of the reference's KERNEL_mqa_rag_buffer (attention_kernel.cu:539+):
    each slot attends to its first context_lens[b] tokens. Returns [B, Hq, Dv].
    """
    B, Hq, D = q.shape
    _, KV, Hkv, Dv = v.shape
    qg = _group_heads(q, Hkv)  # [B, Hkv, G, D]

    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k, preferred_element_type=jnp.float32
    )  # [B, Hkv, G, KV]
    scores = scores * scale

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (B, KV), 1)
    mask = k_pos < context_lens[:, None]
    if sliding_window > 0:
        mask &= k_pos > (context_lens[:, None] - 1 - sliding_window)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgs,bskd->bkgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, Hq, Dv).astype(q.dtype)
