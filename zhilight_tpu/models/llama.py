"""LLaMA-family transformer (functional JAX).

Covers every dense architecture the reference's ``model::LLaMA`` graph serves
(src/model/llama.cpp:11-56, src/nn/block/block.cpp): llama / mistral / qwen2
(attn bias) / qwen3 (qk-norm) / cohere (parallel residual, LayerNorm,
logit_scale, tied head) / MiniCPM "cpm_dragonfly" (scale_emb, scale_depth,
dim_model_base logits scaling). MoE layers (mixtral / qwen*-moe / deepseek
ff) dispatch to :mod:`zhilight_tpu.models.moe`; MLA attention (deepseek) to
:mod:`zhilight_tpu.models.mla`.

Design: params are a plain nested dict pytree; forward functions are pure and
jitted by the engine with the KV cache donated. Layers run in a Python loop
(static unroll) so per-layer heterogeneity (dense-vs-MoE, per-layer quant)
costs nothing.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.model_config import ModelConfig
from ..kvcache.paged import KVCache, gather_kv, write_kv
from ..ops.activations import gated_act
from ..ops.attention import decode_attention, prefill_attention
from ..ops.linear import linear
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import RopeTable, apply_rope_rot, build_rope_table
from .base import DecodeMeta, PackedPrefillMeta, PrefillMeta

__all__ = ["build_rope", "init_params", "forward_prefill", "forward_decode", "get_logits"]

Params = Dict[str, jax.Array]


def build_rope(cfg: ModelConfig, max_model_len: int = 0) -> RopeTable:
    return build_rope_table(
        cfg.mla.qk_rope_head_dim if cfg.mla.enabled else cfg.dim_head,
        cfg.rope_theta,
        cfg.rope,
        cfg.max_position_embeddings,
        max_model_len,
    )


def _norm(p: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if cfg.rms_norm:
        return rms_norm(x, p["w"], cfg.eps)
    return layer_norm(x, p["w"], cfg.eps)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _qkv(p: Params, cfg: ModelConfig, x: jax.Array):
    """Project to q/k/v; supports split or fused qkv weights
    (reference CPM_FUSE_QKV, linear.cpp fuse3)."""
    T = x.shape[0]
    hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.dim_head
    if "qkv_proj" in p:
        qkv = linear(p["qkv_proj"], x)
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
    else:
        q = linear(p["q_proj"], x)
        k = linear(p["k_proj"], x)
        v = linear(p["v_proj"], x)
    return (
        q.reshape(T, hq, d),
        k.reshape(T, hkv, d),
        v.reshape(T, hkv, d),
    )


def _maybe_qk_norm(p: Params, cfg: ModelConfig, q: jax.Array, k: jax.Array):
    if not cfg.qk_norm:
        return q, k
    if cfg.rms_norm:  # qwen3 style per-head RMS
        return rms_norm(q, p["q_norm"]["w"], cfg.eps), rms_norm(k, p["k_norm"]["w"], cfg.eps)
    # cohere use_qk_norm: per-head LayerNorm
    return layer_norm(q, p["q_norm"]["w"], cfg.eps), layer_norm(k, p["k_norm"]["w"], cfg.eps)


def _use_pallas_decode(cfg: ModelConfig, cache: KVCache) -> bool:
    """Route decode attention to the Pallas paged kernel on TPU.

    Requirements: lane-aligned head_dim; int8 cache uses the jnp dequant path
    until the quantized kernel variant lands. ZT_NO_PALLAS=1 forces the XLA
    fallback for debugging.
    """
    import os

    if os.environ.get("ZT_NO_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    # slot-major pages DMA on the untiled dim, so any head_dim lowers;
    # quantized caches take the dedicated int8 kernel
    return True


def _use_fused_write(cfg: ModelConfig, cache: KVCache) -> bool:
    """Opt-in (ZT_FUSED_KV=1): fuse the decode KV write into the attention
    kernel. Measured SLOWER than write-then-attend on v5e and kept only as an
    experiment: the fused kernel's device time equals the separate pair's
    (kernel launch overhead within a jit program is negligible), and
    aliasing the pool while it is also a fetch operand makes XLA insert
    defensive pool copies (+6.5 ms/step at 32 layers; llama8b single-step
    24.7 ms unfused / 30.8 ms fused, profiled 2026-08-16)."""
    import os

    # packed pools are head-major now; the fused kernel is slot-major only
    return (
        os.environ.get("ZT_FUSED_KV") == "1"
        and not cache.quantized
        and not cache.packed
    )


def _pallas_interpret() -> bool:
    """ZT_PALLAS_INTERPRET=1 runs the Pallas kernels in interpret mode so the
    TPU code path is testable on CPU."""
    import os

    return os.environ.get("ZT_PALLAS_INTERPRET") == "1"


_SIDE_NEG = -1.0e38  # finite stand-in for the kernels' NEG_INF in XLA math


def _side_window_attention(cfg, cache, layer_idx, q, k, v, meta, side, scale):
    """Decode attention with the window side buffer (window-batched KV
    writes): pool partials come from the Pallas kernel masked to the
    window-entry context; the <= Kw window rows (including this step's, which
    never touched the pool yet) are attended in XLA and merged exactly via
    the flash combine. Saves num_steps-1 of every num_steps pool write
    kernels per layer — the pool is written once per window by
    flush_side_rows_hm."""
    from ..ops.pallas.attn_headmajor import paged_decode_attention_hm

    B, Hq, D = q.shape
    Hkv = cfg.num_kv_heads
    G = Hq // Hkv

    rows = side["rows"]  # [B, Hkv, Kw, 2D]
    if cache.quantized:
        # quantize-dequantize so window rows carry the same values the int8
        # pool will hold after the flush (per-step int8 write semantics)
        from ..kvcache.paged import _quantize_rows

        kq, ksc = _quantize_rows(k)
        vq, vsc = _quantize_rows(v)
        k = (kq.astype(jnp.float32) * ksc[..., None]).astype(k.dtype)
        v = (vq.astype(jnp.float32) * vsc[..., None]).astype(v.dtype)
    upd = jnp.concatenate([k, v], axis=-1).astype(rows.dtype)[:, :, None, :]
    rows = jax.lax.dynamic_update_slice(
        rows, upd, (0, 0, side["step"], 0)
    )

    from ..parallel import kernel_partitioning_enabled

    if cache.quantized:
        if kernel_partitioning_enabled():
            from ..ops.pallas.partitioned import (
                paged_decode_attention_hm_q_partial_sharded as _pq,
            )

            partial = _pq(
                q, cache.k[layer_idx], cache.k_scale[layer_idx],
                cache.v_scale[layer_idx], meta.page_tables, side["pool_lens"],
                cache.page_size, scale, interpret=_pallas_interpret(),
            )
        else:
            from ..ops.pallas.attn_headmajor import paged_decode_attention_hm_q

            partial = paged_decode_attention_hm_q(
                q, cache.k[layer_idx], cache.k_scale[layer_idx],
                cache.v_scale[layer_idx], meta.page_tables, side["pool_lens"],
                cache.page_size, scale, 0,
                interpret=_pallas_interpret(), emit_partial=True,
            )
    elif kernel_partitioning_enabled():
        from ..ops.pallas.partitioned import (
            paged_decode_attention_hm_partial_sharded,
        )

        partial = paged_decode_attention_hm_partial_sharded(
            q, cache.k[layer_idx], meta.page_tables, side["pool_lens"],
            cache.page_size, scale, interpret=_pallas_interpret(),
        )
    else:
        partial = paged_decode_attention_hm(
            q,
            cache.k[layer_idx],
            meta.page_tables,
            side["pool_lens"],
            cache.page_size,
            scale,
            0,
            interpret=_pallas_interpret(),
            emit_partial=True,
        )  # [B, Hkv, G, 2D] fp32: lane0 m, lane1 l, [D:] unnormalized acc
    m_pool = jnp.maximum(partial[..., 0:1], _SIDE_NEG)
    l_pool = partial[..., 1:2]
    acc_pool = partial[..., D:]

    ks = rows[..., :D].astype(jnp.float32)  # [B, Hkv, Kw, D]
    vs = rows[..., D:].astype(jnp.float32)
    qg = q.reshape(B, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhkd->bhgk", qg, ks) * scale
    # cols beyond this step are still zero-initialized and masked: valid is
    # set per step, so no step comparison is needed
    s = jnp.where(side["valid"][:, None, None, :], s, 2.0 * _SIDE_NEG)
    m_side = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), _SIDE_NEG)
    p_side = jnp.exp(s - m_side)
    l_side = jnp.sum(p_side, axis=-1, keepdims=True)
    acc_side = jnp.einsum("bhgk,bhkd->bhgd", p_side, vs)

    m_tot = jnp.maximum(m_pool, m_side)
    a_pool = jnp.exp(m_pool - m_tot)
    a_side = jnp.exp(m_side - m_tot)
    l_tot = jnp.maximum(l_pool * a_pool + l_side * a_side, 1e-20)
    out = (acc_pool * a_pool + acc_side * a_side) / l_tot
    return out.astype(q.dtype).reshape(B, Hq * D), rows


def attention_layer(
    p: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    x: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    layer_idx: int,
    meta,
    mode: str,
    rot=None,
    side=None,
) -> Tuple[jax.Array, KVCache]:
    """Standard / GQA attention with paged cache (reference nn::Attention
    dyn_rag_forward, src/nn/attention/attention.cpp:442-700).

    ``side`` (decode windows only) defers the KV pool write: the current
    token's rows accumulate in a per-layer side buffer, the Pallas kernel
    emits flash partials over the pool, and the window rows merge in XLA —
    see forward_decode_window. Returns (out, cache, new_side_rows) then."""
    n = x.shape[0]
    q, k, v = _qkv(p, cfg, x)
    q, k = _maybe_qk_norm(p, cfg, q, k)
    if rot is None:
        rot = rope.rot_values(positions)
    cos_f, sin_f = rot
    q = apply_rope_rot(q, cos_f, sin_f, rope.neox_style)
    k = apply_rope_rot(k, cos_f, sin_f, rope.neox_style)

    scale = 1.0 / math.sqrt(cfg.dim_head)

    if side is not None:
        assert mode == "decode"
        out, rows = _side_window_attention(
            cfg, cache, layer_idx, q, k, v, meta, side, scale
        )
        return linear(p["o_proj"], out), cache, rows

    if (
        mode == "decode"
        and _use_pallas_decode(cfg, cache)
        and _use_fused_write(cfg, cache)
    ):
        from ..ops.pallas.paged_attention import paged_decode_attention_fused

        out, ko, vo = paged_decode_attention_fused(
            q,
            cache.k[layer_idx],
            None if cache.packed else cache.v[layer_idx],
            k,
            v,
            meta.slot_mapping,
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            cfg.sliding_window,
        )
        cache = (
            cache.set_layer(layer_idx, k=ko)
            if cache.packed
            else cache.set_layer(layer_idx, k=ko, v=vo)
        )
        out = out.reshape(n, cfg.num_heads * cfg.dim_head)
        return linear(p["o_proj"], out), cache

    cache = write_kv(cache, layer_idx, k, v, meta.slot_mapping)

    if mode == "prefill" and isinstance(meta, PackedPrefillMeta):
        # packed multi-sequence chunk (reference encode groups,
        # batch_generator.cpp:1086-1212): one fused program, per-segment
        # causal attention
        if _use_pallas_decode(cfg, cache) and cache.packed and not cache.quantized:
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import (
                    paged_prefill_attention_hm_packed_sharded as _pfp,
                )
            else:
                from ..ops.pallas.prefill_attention import (
                    paged_prefill_attention_hm_packed as _pfp,
                )
            out = _pfp(
                q,
                cache.k[layer_idx],
                meta.page_tables,
                meta.cache_lens,
                meta.q_lens,
                cache.page_size,
                scale,
                cfg.sliding_window,
            )
        elif _use_pallas_decode(cfg, cache) and cache.packed and cache.quantized:
            # int8 pool: flash prefill with per-page scale folds (reference
            # quant_attention.cuh) — was the gather+dequant TTFT killer
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import (
                    paged_prefill_attention_hm_packed_q_sharded as _pfpq,
                )
            else:
                from ..ops.pallas.prefill_attention import (
                    paged_prefill_attention_hm_packed_q as _pfpq,
                )
            out = _pfpq(
                q,
                cache.k[layer_idx],
                cache.k_scale[layer_idx],
                cache.v_scale[layer_idx],
                meta.page_tables,
                meta.cache_lens,
                meta.q_lens,
                cache.page_size,
                scale,
                cfg.sliding_window,
            )
        else:
            # XLA fallback: per-segment gather + dense causal attention
            NS = meta.num_segments
            TC = n // NS
            outs = []
            for s in range(NS):
                ck, cv = gather_kv(cache, layer_idx, meta.page_tables[s])
                outs.append(
                    prefill_attention(
                        q[s * TC : (s + 1) * TC],
                        ck,
                        cv,
                        meta.cache_lens[s],
                        meta.q_lens[s],
                        scale,
                        cfg.sliding_window,
                    )
                )
            out = jnp.concatenate(outs, axis=0)
        out = out.reshape(n, cfg.num_heads * cfg.dim_head)
        return linear(p["o_proj"], out), cache

    if mode == "prefill":
        if _use_pallas_decode(cfg, cache) and cache.packed and not cache.quantized:
            # flash chunked-prefill: stream context pages, no full gather
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import (
                    paged_prefill_attention_hm_sharded as _pf,
                )
            else:
                from ..ops.pallas.prefill_attention import (
                    paged_prefill_attention_hm as _pf,
                )
            out = _pf(
                q,
                cache.k[layer_idx],
                meta.page_table,
                meta.cache_len,
                meta.q_len,
                cache.page_size,
                scale,
                cfg.sliding_window,
            )
        elif _use_pallas_decode(cfg, cache) and cache.packed and cache.quantized:
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import (
                    paged_prefill_attention_hm_q_sharded as _pfq,
                )
            else:
                from ..ops.pallas.prefill_attention import (
                    paged_prefill_attention_hm_q as _pfq,
                )
            out = _pfq(
                q,
                cache.k[layer_idx],
                cache.k_scale[layer_idx],
                cache.v_scale[layer_idx],
                meta.page_table,
                meta.cache_len,
                meta.q_len,
                cache.page_size,
                scale,
                cfg.sliding_window,
            )
        else:
            ck, cv = gather_kv(cache, layer_idx, meta.page_table)
            out = prefill_attention(
                q, ck, cv, meta.cache_len, meta.q_len, scale, cfg.sliding_window
            )
    elif _use_pallas_decode(cfg, cache) and cache.quantized and cache.packed:
        # int8 packed head-major: half the decode HBM bytes of bf16
        from ..parallel import kernel_partitioning_enabled

        if kernel_partitioning_enabled():
            from ..ops.pallas.partitioned import (
                paged_decode_attention_hm_q_sharded as paged_decode_attention_hm_q,
            )
        else:
            from ..ops.pallas.attn_headmajor import paged_decode_attention_hm_q

        out = paged_decode_attention_hm_q(
            q,
            cache.k[layer_idx],
            cache.k_scale[layer_idx],
            cache.v_scale[layer_idx],
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            cfg.sliding_window,
        )
    elif _use_pallas_decode(cfg, cache) and cache.quantized:
        from ..ops.pallas.paged_attention import paged_decode_attention_q

        out = paged_decode_attention_q(
            q,
            cache.k[layer_idx],
            cache.v[layer_idx],
            cache.k_scale[layer_idx],
            cache.v_scale[layer_idx],
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            cfg.sliding_window,
        )
    elif _use_pallas_decode(cfg, cache) and cache.packed:
        from ..parallel import kernel_partitioning_enabled

        if kernel_partitioning_enabled():
            # multi-device mesh: the SPMD-partitioned wrapper keeps the
            # head-sharded pool local to each shard (plain pallas custom
            # calls are opaque to the partitioner and would be all-gathered)
            from ..ops.pallas.partitioned import (
                paged_decode_attention_hm_sharded as _attn,
            )
        else:
            from ..ops.pallas.attn_headmajor import (
                paged_decode_attention_hm as _attn,
            )

        out = _attn(
            q,
            cache.k[layer_idx],
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            cfg.sliding_window,
        )
    elif _use_pallas_decode(cfg, cache):
        from ..ops.pallas.paged_attention import paged_decode_attention

        out = paged_decode_attention(
            q,
            cache.k[layer_idx],
            cache.v[layer_idx],
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            cfg.sliding_window,
        )
    else:
        ck, cv = gather_kv(cache, layer_idx, meta.page_tables)
        out = decode_attention(q, ck, cv, meta.context_lens, scale, cfg.sliding_window)

    out = out.reshape(n, cfg.num_heads * cfg.dim_head)
    return linear(p["o_proj"], out), cache


# ---------------------------------------------------------------------------
# feed-forward
# ---------------------------------------------------------------------------

def mlp_layer(p: Params, cfg: ModelConfig, x: jax.Array, layer_idx: int) -> jax.Array:
    if cfg.is_moe_layer(layer_idx):
        from .moe import moe_layer

        return moe_layer(p, cfg, x)
    return dense_mlp(p, cfg, x)


def dense_mlp(p: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """SwiGLU MLP; supports fused gate+up (reference CPM_FUSE_FF_IN)."""
    if "gate_up_proj" in p:
        gu = linear(p["gate_up_proj"], x)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = linear(p["gate_proj"], x)
        u = linear(p["up_proj"], x)
    return linear(p["down_proj"], gated_act(g, u, cfg.activate_fn))


# ---------------------------------------------------------------------------
# transformer block
# ---------------------------------------------------------------------------

def decoder_layer(
    p: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    x: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    layer_idx: int,
    meta,
    mode: str,
    rot=None,  # shared full-width (cos, sin) computed once per forward
    side=None,
) -> Tuple[jax.Array, KVCache]:
    """Pre-LN block (reference nn::EncoderLayer, src/nn/block/block.cpp):
    sequential residual by default, Cohere parallel variant (block.cpp:444-481),
    MiniCPM depth-scaled residual (scale_depth/sqrt(L)).

    With ``side`` (decode windows) returns (x, cache, new_side_rows)."""
    if cfg.mla.enabled:
        from .mla import mla_attention_layer as attn_fn
    else:
        attn_fn = attention_layer

    res_scale = (
        cfg.scale_depth / math.sqrt(cfg.num_layers) if cfg.scale_depth != 1.0 else 1.0
    )

    def attn(h):
        if side is not None:
            return attn_fn(
                p["attn"], cfg, rope, h, positions, cache, layer_idx, meta, mode,
                rot=rot, side=side,
            )
        out, c = attn_fn(
            p["attn"], cfg, rope, h, positions, cache, layer_idx, meta, mode, rot=rot
        )
        return out, c, None

    if cfg.parallel_residual:
        h = _norm(p["ln_attn"], cfg, x)
        attn_out, cache, rows = attn(h)
        ff_out = mlp_layer(p["mlp"], cfg, h, layer_idx)
        x = x + attn_out + ff_out
        return (x, cache, rows) if side is not None else (x, cache)

    h = _norm(p["ln_attn"], cfg, x)
    attn_out, cache, rows = attn(h)
    x = x + attn_out * res_scale
    h = _norm(p["ln_ff"], cfg, x)
    ff_out = mlp_layer(p["mlp"], cfg, h, layer_idx)
    x = x + ff_out * res_scale
    return (x, cache, rows) if side is not None else (x, cache)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def embed(params: Params, cfg: ModelConfig, tokens: jax.Array) -> jax.Array:
    x = params["embedding"]["w"][tokens]
    if cfg.scale_emb != 1.0:
        x = x * cfg.scale_emb
    return x.astype(cfg.jax_dtype)


def backbone(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    meta,
    mode: str,
    input_embeddings: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Embedding -> N blocks -> final norm. ``input_embeddings`` overrides the
    token embedding (multimodal path — reference SearchTask.input_embeddings)."""
    x = embed(params, cfg, tokens) if input_embeddings is None else input_embeddings
    rot = rope.rot_values(positions)  # shared by every layer (one gather)
    for i in range(cfg.num_layers):
        x, cache = decoder_layer(
            params["layers"][str(i)], cfg, rope, x, positions, cache, i, meta, mode,
            rot=rot,
        )
    return _norm(params["final_norm"], cfg, x), cache


def get_logits(params: Params, cfg: ModelConfig, hidden: jax.Array) -> jax.Array:
    """Project hidden states to vocab logits in fp32 (reference
    LLaMA::get_logits + MiniCPM/Cohere scaling specializations)."""
    if cfg.dim_model_base:
        hidden = hidden / (cfg.dim_model / cfg.dim_model_base)
    if cfg.tie_lm_head:
        w = params["embedding"]["w"]
        logits = jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden, params["lm_head"]["w"], preferred_element_type=jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits


def forward_prefill(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,  # [T]
    meta: PrefillMeta,
    cache: KVCache,
    input_embeddings: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Process one prefill chunk; returns logits [vocab] of the last valid
    token (what sampling needs) and the updated cache."""
    hidden, cache = backbone(
        params, cfg, rope, tokens, meta.positions, cache, meta, "prefill", input_embeddings
    )
    last = jnp.maximum(meta.q_len - 1, 0)
    logits = get_logits(params, cfg, hidden[last])
    return logits, cache


def forward_prefill_packed(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,  # [T] = [NS * TC]
    meta: PackedPrefillMeta,
    cache: KVCache,
    input_embeddings: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Packed multi-sequence chunk (reference encode group); returns the
    last-valid-token logits of every segment [NS, vocab] and the cache.
    Padded segments (q_len 0) produce garbage rows the host discards."""
    hidden, cache = backbone(
        params, cfg, rope, tokens, meta.positions, cache, meta, "prefill",
        input_embeddings,
    )
    NS = meta.num_segments
    TC = tokens.shape[0] // NS
    rows = jnp.arange(NS) * TC + jnp.maximum(meta.q_lens - 1, 0)
    logits = get_logits(params, cfg, hidden[rows])
    return logits, cache


def forward_score(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,  # [T]
    meta: PrefillMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Full-sequence logits [T, vocab] (reference calc_logits path,
    src/model/llama.h:100-131 — scoring utilities run the encoder and keep
    every position's logits rather than just the last)."""
    hidden, cache = backbone(
        params, cfg, rope, tokens, meta.positions, cache, meta, "prefill"
    )
    return get_logits(params, cfg, hidden), cache


def forward_hidden(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,  # [T]
    meta: PrefillMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Full-sequence last-layer hidden states [T, dim] after the final norm
    (reference output_hidden_states / fill_last_hidden_states,
    batch_generator.cpp:734-752)."""
    hidden, cache = backbone(
        params, cfg, rope, tokens, meta.positions, cache, meta, "prefill"
    )
    return hidden, cache


def forward_decode(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,  # [B]
    meta: DecodeMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """One decode step for all active slots; returns logits [B, vocab]."""
    hidden, cache = backbone(
        params, cfg, rope, tokens, meta.positions, cache, meta, "decode"
    )
    return get_logits(params, cfg, hidden), cache


def new_side_rows(cfg: ModelConfig, batch: int, window: int, dtype):
    """Zeroed per-layer window side buffers: [B, Hkv, Kw, 2*dim_head] for
    standard/GQA attention, [B, Kw, stored] (lane-padded latent) for MLA."""
    if cfg.mla.enabled:
        stored = (cfg.mla.latent_dim + 127) // 128 * 128
        return tuple(
            jnp.zeros((batch, window, stored), dtype)
            for _ in range(cfg.num_layers)
        )
    return tuple(
        jnp.zeros((batch, cfg.num_kv_heads, window, 2 * cfg.dim_head), dtype)
        for _ in range(cfg.num_layers)
    )


def forward_decode_window(
    params: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    tokens: jax.Array,       # [B]
    meta: DecodeMeta,
    cache: KVCache,
    side_rows,               # tuple of [B, Hkv, Kw, 2D] per layer
    side_valid: jax.Array,   # [B, Kw] bool; col j set iff slot was active at step j
    pool_lens: jax.Array,    # [B] window-entry pool length (rows already flushed)
    step: jax.Array,         # scalar int32 step index in the window
) -> Tuple[jax.Array, KVCache, tuple]:
    """One decode step with window-batched KV writes: each layer appends the
    step's K/V to its side buffer instead of RMW-writing the pool, and
    attention merges pool partials (Pallas) with the side rows (XLA).
    flush_window_rows writes the pool once at the end of the window."""
    x = embed(params, cfg, tokens)
    rot = rope.rot_values(meta.positions)
    new_rows = []
    for i in range(cfg.num_layers):
        sd = {
            "rows": side_rows[i],
            "valid": side_valid,
            "pool_lens": pool_lens,
            "step": step,
        }
        x, cache, r = decoder_layer(
            params["layers"][str(i)], cfg, rope, x, meta.positions, cache, i,
            meta, "decode", rot=rot, side=sd,
        )
        new_rows.append(r)
    hidden = _norm(params["final_norm"], cfg, x)
    return get_logits(params, cfg, hidden), cache, tuple(new_rows)


def flush_window_rows(
    cfg: ModelConfig,
    cache: KVCache,
    side_rows,              # tuple of [B, Hkv, Kw, 2D]
    side_valid: jax.Array,  # [B, Kw]
    entry_pos: jax.Array,   # [B] position of each slot's first window row
    page_tables: jax.Array,
) -> KVCache:
    """End-of-window side-buffer flush into the paged pool (<=2 page RMWs per
    slot per layer instead of one per step)."""
    from ..parallel import kernel_partitioning_enabled

    if kernel_partitioning_enabled():
        from ..ops.pallas.partitioned import (
            flush_side_rows_hm_sharded as flush_side_rows_hm,
        )
    else:
        from ..ops.pallas.kv_write import flush_side_rows_hm

    n_rows = jnp.sum(side_valid.astype(jnp.int32), axis=1)

    if cfg.mla.enabled:
        if kernel_partitioning_enabled():
            from ..ops.pallas.partitioned import (
                flush_side_rows_2d_sharded as flush_side_rows_2d,
            )
        else:
            from ..ops.pallas.kv_write import flush_side_rows_2d

        for i in range(cfg.num_layers):
            pool = flush_side_rows_2d(
                cache.latent[i], side_rows[i], entry_pos, n_rows, page_tables,
                cache.page_size, interpret=_pallas_interpret(),
            )
            cache = cache.set_layer(i, latent=pool)
        return cache

    B, Hkv, Kw, D2 = side_rows[0].shape
    D = D2 // 2

    if cache.quantized:
        # side rows hold dequantized values: requantize (idempotent on the
        # value grid) and scatter the per-(token, head) scales slot-major
        from ..kvcache.paged import _quantize_rows

        S = cache.page_size
        p = entry_pos[:, None] + jnp.arange(Kw)[None, :]  # [B, Kw]
        maxp = page_tables.shape[1]
        pg = jnp.clip(p // S, 0, maxp - 1)
        page = jnp.take_along_axis(jnp.maximum(page_tables, 0), pg, axis=1)
        slots = page * S + p % S
        live = jnp.arange(Kw)[None, :] < n_rows[:, None]
        slots = jnp.where(live, slots, cache.num_slots).reshape(-1)  # drop

    for i in range(cfg.num_layers):
        rows = side_rows[i]
        if cache.quantized:
            kq, ks = _quantize_rows(rows[..., :D])
            vq, vs = _quantize_rows(rows[..., D:])
            rows = jnp.concatenate([kq, vq], axis=-1)  # [B, Hkv, Kw, 2D] int8
            # scales [B, Hkv, Kw] -> rows of the slot-major [N, Hkv] arrays
            ks_f = jnp.swapaxes(ks, 1, 2).reshape(-1, Hkv)
            vs_f = jnp.swapaxes(vs, 1, 2).reshape(-1, Hkv)
            cache = cache.set_layer(
                i,
                k_scale=cache.k_scale[i].at[slots].set(ks_f, mode="drop"),
                v_scale=cache.v_scale[i].at[slots].set(vs_f, mode="drop"),
            )
        pool = flush_side_rows_hm(
            cache.k[i], rows, entry_pos, n_rows, page_tables,
            cache.page_size, interpret=_pallas_interpret(),
        )
        cache = cache.set_layer(i, k=pool)
    return cache


# ---------------------------------------------------------------------------
# random init (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, rng: jax.Array, dtype=None) -> Params:
    dtype = dtype or cfg.jax_dtype
    d, hq, hkv, dh = cfg.dim_model, cfg.num_heads, cfg.num_kv_heads, cfg.dim_head
    keys = iter(jax.random.split(rng, 16 + cfg.num_layers * 16))

    def dense(shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    def lin(in_dim, out_dim, bias=False):
        p = {"w": dense((in_dim, out_dim))}
        if bias:
            p["b"] = jnp.zeros((out_dim,), dtype)
        return p

    def layer(i: int) -> Params:
        if cfg.mla.enabled:
            m = cfg.mla
            attn = {
                "kv_a_proj": lin(d, m.kv_lora_rank + m.qk_rope_head_dim),
                "kv_a_norm": {"w": jnp.ones((m.kv_lora_rank,), dtype)},
                "kv_b_proj": lin(m.kv_lora_rank, hq * (m.qk_nope_head_dim + m.v_head_dim)),
                "o_proj": lin(hq * m.v_head_dim, d),
            }
            if m.q_lora_rank:
                attn["q_a_proj"] = lin(d, m.q_lora_rank)
                attn["q_a_norm"] = {"w": jnp.ones((m.q_lora_rank,), dtype)}
                attn["q_b_proj"] = lin(m.q_lora_rank, hq * m.qk_head_dim)
            else:
                attn["q_proj"] = lin(d, hq * m.qk_head_dim)
        else:
            attn = {
                "q_proj": lin(d, hq * dh, cfg.attn_bias),
                "k_proj": lin(d, hkv * dh, cfg.attn_bias),
                "v_proj": lin(d, hkv * dh, cfg.attn_bias),
                "o_proj": lin(hq * dh, d),
            }
        if cfg.qk_norm and not cfg.mla.enabled:
            attn["q_norm"] = {"w": jnp.ones((dh,), dtype)}
            attn["k_norm"] = {"w": jnp.ones((dh,), dtype)}
        if cfg.is_moe_layer(i):
            from .moe import init_moe_params

            mlp = init_moe_params(cfg, next(keys), dtype)
        else:
            mlp = {
                "gate_proj": lin(d, cfg.dim_ff),
                "up_proj": lin(d, cfg.dim_ff),
                "down_proj": lin(cfg.dim_ff, d),
            }
        p = {"ln_attn": {"w": jnp.ones((d,), dtype)}, "attn": attn, "mlp": mlp}
        if not cfg.parallel_residual:
            p["ln_ff"] = {"w": jnp.ones((d,), dtype)}
        return p

    params: Params = {
        "embedding": {"w": dense((cfg.vocab_size, d), scale=0.02)},
        "layers": {str(i): layer(i) for i in range(cfg.num_layers)},
        "final_norm": {"w": jnp.ones((d,), dtype)},
    }
    if not cfg.tie_lm_head:
        params["lm_head"] = {"w": dense((d, cfg.vocab_size), scale=0.02)}
    return params
