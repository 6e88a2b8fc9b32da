"""Multi-head Latent Attention (DeepSeek-V2/V3).

Parity target: reference ``Attention::impl::MLAImpl``
(src/nn/attention/multi_head_latent_attention.cpp, 1503 LoC): low-rank q
(q_a/q_b) and kv (kv_a_proj_with_mqa / kv_b_proj) projections, the compressed
latent KV cache storing ``kv_lora_rank + qk_rope_head_dim`` per token
(LATENT_CACHE, batch_generator.cpp:594-596), and the absorbed-weight decode
path (``forward_compressed_cache``) where attention runs entirely in latent
space as single-"head" MQA:

  q_latent[h]  = q_nope[h] @ W_UK[h]          (absorb k up-projection)
  score        = q_latent · c_kv + q_pe · k_pe
  out_latent   = softmax(score) · c_kv
  out[h]       = out_latent @ W_UV[h]         (absorb v up-projection)

Prefill decompresses gathered latents through kv_b_proj (handles chunked
prefill / prefix-cache hits uniformly). Softmax scale follows DeepSeek YaRN:
qk_head_dim^-0.5 * yarn_mscale(factor, mscale_all_dim)^2.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config.model_config import ModelConfig
from ..kvcache.paged import KVCache, gather_latent, write_latent
from ..ops.attention import NEG_INF
from ..ops.linear import linear
from ..ops.norms import rms_norm
from ..ops.rope import RopeTable, apply_rope_rot

__all__ = ["mla_attention_layer", "mla_softmax_scale"]

Params = Dict[str, jax.Array]


def _yarn_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def mla_softmax_scale(cfg: ModelConfig) -> float:
    scale = 1.0 / math.sqrt(cfg.mla.qk_head_dim)
    r = cfg.rope
    if r.type == "yarn" and r.mscale_all_dim:
        m = _yarn_mscale(r.factor, r.mscale_all_dim)
        scale = scale * m * m
    return scale


def _project_q(p: Params, cfg: ModelConfig, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (q_nope [T, H, nope], q_pe [T, H, rope])."""
    m = cfg.mla
    T = x.shape[0]
    if m.q_lora_rank:
        qa = linear(p["q_a_proj"], x)
        qa = rms_norm(qa, p["q_a_norm"]["w"], cfg.eps)
        q = linear(p["q_b_proj"], qa)
    else:
        q = linear(p["q_proj"], x)
    q = q.reshape(T, cfg.num_heads, m.qk_head_dim)
    return q[..., : m.qk_nope_head_dim], q[..., m.qk_nope_head_dim :]


def _kv_b_weights(p: Params, cfg: ModelConfig) -> Tuple[jax.Array, jax.Array]:
    """Split kv_b_proj [lora, H*(nope+v)] into W_UK [lora, H, nope] and
    W_UV [lora, H, v]."""
    m = cfg.mla
    w = p["kv_b_proj"]["w"].reshape(
        m.kv_lora_rank, cfg.num_heads, m.qk_nope_head_dim + m.v_head_dim
    )
    return w[..., : m.qk_nope_head_dim], w[..., m.qk_nope_head_dim :]


def mla_attention_layer(
    p: Params,
    cfg: ModelConfig,
    rope: RopeTable,
    x: jax.Array,  # [T, D]
    positions: jax.Array,
    cache: KVCache,
    layer_idx: int,
    meta,
    mode: str,
    rot=None,
    side=None,
) -> Tuple[jax.Array, KVCache]:
    m = cfg.mla
    T = x.shape[0]
    scale = mla_softmax_scale(cfg)

    q_nope, q_pe = _project_q(p, cfg, x)
    if rot is None:
        rot = rope.rot_values(positions)
    cos_f, sin_f = rot
    q_pe = apply_rope_rot(q_pe, cos_f, sin_f, rope.neox_style)

    kv_a = linear(p["kv_a_proj"], x)  # [T, lora + rope]
    c_kv = rms_norm(kv_a[..., : m.kv_lora_rank], p["kv_a_norm"]["w"], cfg.eps)
    k_pe = kv_a[..., m.kv_lora_rank :][:, None, :]  # [T, 1, rope]
    k_pe = apply_rope_rot(k_pe, cos_f, sin_f, rope.neox_style)[:, 0]  # [T, rope]

    latent = jnp.concatenate([c_kv, k_pe], axis=-1)  # [T, latent_dim]
    w_uk, w_uv = _kv_b_weights(p, cfg)

    if side is not None:
        # decode-window side buffer: defer the latent pool write, merge the
        # window's latent rows in XLA with the kernel's flash partials
        assert mode == "decode"
        out, rows = _side_window_mla(
            cfg, cache, layer_idx, q_nope, q_pe, latent, w_uk, w_uv, meta,
            side, scale, m,
        )
        out = out.reshape(T, cfg.num_heads * m.v_head_dim)
        return linear(p["o_proj"], out), cache, rows

    if mode == "decode" and _use_pallas_mla() and _use_fused_latent():
        # fused write+attend: one kernel per layer, pool aliased in place
        out, cache = _mla_decode_pallas_fused(
            q_nope, q_pe, latent, cache, layer_idx, w_uk, w_uv, meta, scale, m
        )
        out = out.reshape(T, cfg.num_heads * m.v_head_dim)
        return linear(p["o_proj"], out), cache

    cache = write_latent(cache, layer_idx, latent, meta.slot_mapping)

    if mode == "prefill":
        from .base import PackedPrefillMeta

        if isinstance(meta, PackedPrefillMeta):
            # packed multi-sequence chunk (reference encode group,
            # batch_generator.cpp:1086-1212): the projections above ran on
            # the fused [NS*TC] token batch; attention masks per segment
            NS = meta.num_segments
            TC = T // NS
            outs = []
            for s in range(NS):
                sl = slice(s * TC, (s + 1) * TC)
                ctx_s = gather_latent(cache, layer_idx, meta.page_tables[s])
                outs.append(_mla_prefill(
                    q_nope[sl], q_pe[sl], ctx_s, w_uk, w_uv,
                    meta.cache_lens[s], meta.q_lens[s], scale, m,
                ))
            out = jnp.concatenate(outs, axis=0)
        else:
            ctx = gather_latent(cache, layer_idx, meta.page_table)  # [KV, latent]
            out = _mla_prefill(
                q_nope, q_pe, ctx, w_uk, w_uv, meta.cache_len, meta.q_len, scale, m
            )
    elif _use_pallas_mla():
        out = _mla_decode_pallas(
            q_nope, q_pe, cache, layer_idx, w_uk, w_uv, meta, scale, m
        )
    else:
        ctx = gather_latent(cache, layer_idx, meta.page_tables)  # [B, KV, latent]
        out = _mla_decode(q_nope, q_pe, ctx, w_uk, w_uv, meta.context_lens, scale, m)

    out = out.reshape(T, cfg.num_heads * m.v_head_dim)
    return linear(p["o_proj"], out), cache


def _use_pallas_mla() -> bool:
    import os

    if os.environ.get("ZT_NO_PALLAS") == "1":
        return False
    return jax.default_backend() == "tpu"


def _use_fused_latent() -> bool:
    # opt-in experiment; see llama._use_fused_write for why it is off
    import os

    return os.environ.get("ZT_FUSED_KV") == "1"


def _q_eff(q_nope, q_pe, w_uk):
    """Absorb W_UK into q and append the rope part: [B, H, lora + rope]."""
    q_latent = jnp.einsum(
        "bhn,lhn->bhl", q_nope, w_uk, preferred_element_type=jnp.float32
    ).astype(q_nope.dtype)
    return jnp.concatenate([q_latent, q_pe.astype(q_nope.dtype)], axis=-1)


def _mla_decode_pallas_fused(
    q_nope, q_pe, latent_new, cache, layer_idx, w_uk, w_uv, meta, scale, m
):
    """Fused latent write + absorbed MQA decode
    (ops/pallas/paged_attention.paged_mla_decode_fused)."""
    from ..ops.pallas.paged_attention import paged_mla_decode_fused

    out_latent, pool = paged_mla_decode_fused(
        _q_eff(q_nope, q_pe, w_uk),
        cache.latent[layer_idx],
        latent_new,
        meta.slot_mapping,
        meta.page_tables,
        meta.context_lens,
        cache.page_size,
        scale,
        v_dim=m.kv_lora_rank,
    )
    out = jnp.einsum(
        "bhl,lhv->bhv", out_latent.astype(jnp.float32), w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q_nope.dtype)
    return out, cache.set_layer(layer_idx, latent=pool)


def _side_window_mla(
    cfg, cache, layer_idx, q_nope, q_pe, latent, w_uk, w_uv, meta, side,
    scale, m,
):
    """MLA decode with the window side buffer: latent rows accumulate in
    [B, Kw, stored]; the pallas latent kernel emits flash partials over the
    pool (masked to the window-entry context) and the side rows merge in
    XLA (same math as _mla_decode restricted to the window)."""
    from .llama import _pallas_interpret
    from ..ops.pallas.paged_attention import paged_mla_decode

    NEG = -1.0e38
    B = q_nope.shape[0]
    pool = cache.latent[layer_idx]
    stored = pool.shape[-1]
    v_dim = m.kv_lora_rank

    rows = side["rows"]  # [B, Kw, stored]
    lat = latent
    if lat.shape[-1] < stored:
        lat = jnp.pad(lat, ((0, 0), (0, stored - lat.shape[-1])))
    rows = jax.lax.dynamic_update_slice(
        rows, lat.astype(rows.dtype)[:, None, :], (0, side["step"], 0)
    )

    q_eff = _q_eff(q_nope, q_pe, w_uk)  # [B, H, k_dim]
    from ..parallel import kernel_partitioning_enabled

    if kernel_partitioning_enabled():
        from ..ops.pallas.partitioned import paged_mla_decode_sharded

        partial = paged_mla_decode_sharded(
            _pad_to(q_eff, pool.shape[-1]), pool, meta.page_tables,
            side["pool_lens"], cache.page_size, scale, v_dim,
            interpret=_pallas_interpret(), emit_partial=True,
        )
    else:
        partial = paged_mla_decode(
            q_eff, pool, meta.page_tables, side["pool_lens"], cache.page_size,
            scale, v_dim=v_dim, interpret=_pallas_interpret(), emit_partial=True,
        )  # [B, H, 128 + v_dim] fp32
    m_pool = jnp.maximum(partial[..., 0:1], NEG)
    l_pool = partial[..., 1:2]
    acc_pool = partial[..., 128:]

    qp = q_eff.astype(jnp.float32)
    if qp.shape[-1] < stored:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, stored - qp.shape[-1])))
    rf = rows.astype(jnp.float32)
    s = jnp.einsum("bhx,bkx->bhk", qp, rf) * scale
    s = jnp.where(side["valid"][:, None, :], s, 2.0 * NEG)
    m_side = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG)
    p_side = jnp.exp(s - m_side)
    l_side = jnp.sum(p_side, axis=-1, keepdims=True)
    acc_side = jnp.einsum("bhk,bkv->bhv", p_side, rf[..., :v_dim])

    m_tot = jnp.maximum(m_pool, m_side)
    a_pool = jnp.exp(m_pool - m_tot)
    a_side = jnp.exp(m_side - m_tot)
    l_tot = jnp.maximum(l_pool * a_pool + l_side * a_side, 1e-20)
    out_latent = (acc_pool * a_pool + acc_side * a_side) / l_tot

    out = jnp.einsum(
        "bhl,lhv->bhv", out_latent, w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q_nope.dtype)
    return out, rows


def _pad_to(x, stored):
    if x.shape[-1] < stored:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, stored - x.shape[-1])]
        return jnp.pad(x, pad)
    return x


def _mla_decode_pallas(q_nope, q_pe, cache, layer_idx, w_uk, w_uv, meta, scale, m):
    """Absorbed latent MQA through the Pallas paged kernel
    (ops/pallas/paged_attention.paged_mla_decode); on multi-device meshes the
    custom_partitioning wrapper keeps the replicated-pool kernel local to
    each (batch/head-sharded) shard."""
    from ..parallel import kernel_partitioning_enabled
    from ..ops.pallas.paged_attention import paged_mla_decode

    pool = cache.latent[layer_idx]
    if kernel_partitioning_enabled():
        from ..ops.pallas.partitioned import paged_mla_decode_sharded

        out_latent = paged_mla_decode_sharded(
            _pad_to(_q_eff(q_nope, q_pe, w_uk), pool.shape[-1]), pool,
            meta.page_tables, meta.context_lens, cache.page_size, scale,
            m.kv_lora_rank,
        )
    else:
        out_latent = paged_mla_decode(
            _q_eff(q_nope, q_pe, w_uk),
            pool,
            meta.page_tables,
            meta.context_lens,
            cache.page_size,
            scale,
            v_dim=m.kv_lora_rank,
        )
    return jnp.einsum(
        "bhl,lhv->bhv", out_latent.astype(jnp.float32), w_uv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(q_nope.dtype)


def _mla_decode(
    q_nope: jax.Array,  # [B, H, nope]
    q_pe: jax.Array,  # [B, H, rope]
    ctx: jax.Array,  # [B, KV, lora + rope]
    w_uk: jax.Array,  # [lora, H, nope]
    w_uv: jax.Array,  # [lora, H, v]
    context_lens: jax.Array,
    scale: float,
    m,
) -> jax.Array:
    """Absorbed-weight MQA in latent space (reference forward_compressed_cache)."""
    B, KV = ctx.shape[0], ctx.shape[1]
    # the latent pool's feature dim is lane-padded; slice explicitly
    c_kv = ctx[..., : m.kv_lora_rank]
    k_pe = ctx[..., m.kv_lora_rank : m.kv_lora_rank + m.qk_rope_head_dim]

    # absorb: q into latent space [B, H, lora]
    q_latent = jnp.einsum(
        "bhn,lhn->bhl", q_nope, w_uk, preferred_element_type=jnp.float32
    ).astype(q_nope.dtype)

    scores = jnp.einsum(
        "bhl,bsl->bhs", q_latent, c_kv, preferred_element_type=jnp.float32
    )
    scores += jnp.einsum(
        "bhr,bsr->bhs", q_pe, k_pe, preferred_element_type=jnp.float32
    )
    scores *= scale

    k_pos = jax.lax.broadcasted_iota(jnp.int32, (B, KV), 1)
    mask = k_pos < context_lens[:, None]
    scores = jnp.where(mask[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)

    out_latent = jnp.einsum(
        "bhs,bsl->bhl", probs.astype(c_kv.dtype), c_kv, preferred_element_type=jnp.float32
    ).astype(q_nope.dtype)
    return jnp.einsum(
        "bhl,lhv->bhv", out_latent, w_uv, preferred_element_type=jnp.float32
    ).astype(q_nope.dtype)


# kv tokens decompressed per scan block: bounds transient memory at
# O(block * H * (nope + v)) instead of O(ctx * H * (nope + v)) — at DeepSeek
# geometry (H=128, nope=v=128) a materialized 8k context is ~0.5 GB of K/V
# plus ~2 GB of fp32 scores; a 256-token block is ~16 MB + 17 MB.
_MLA_PREFILL_BLOCK = 256


def _mla_prefill(
    q_nope: jax.Array,  # [T, H, nope]
    q_pe: jax.Array,  # [T, H, rope]
    ctx: jax.Array,  # [KV, lora + rope]
    w_uk: jax.Array,
    w_uv: jax.Array,
    cache_len: jax.Array,
    q_len: jax.Array,
    scale: float,
    m,
) -> jax.Array:
    """Chunk prefill: stream context latents in blocks — decompress each block
    through kv_b_proj, attend with an online softmax, discard (flash-style;
    reference flash varlen encode, attention.cpp:442-520). The non-absorbed
    form is used because prefill is compute-bound: decompress-once costs
    H*(nope+v) flops/token vs the absorbed path's 2*T*H*(lora+rope) —
    decompression covers chunked-prefill and prefix-cache tokens uniformly."""
    T, H = q_nope.shape[0], q_nope.shape[1]
    KV = ctx.shape[0]
    blk = min(_MLA_PREFILL_BLOCK, KV)
    nb = (KV + blk - 1) // blk
    ctx_p = jnp.pad(ctx, ((0, nb * blk - KV), (0, 0)))
    blocks = ctx_p.reshape(nb, blk, ctx.shape[-1])

    q_pos = cache_len + jnp.arange(T, dtype=jnp.int32)  # [T]
    total = cache_len + q_len
    qn = q_nope
    qp = q_pe

    def body(carry, inp):
        m_run, l_run, acc = carry  # [H,T,1], [H,T,1], [H,T,v] fp32
        bi, cb = inp
        c_kv = cb[..., : m.kv_lora_rank]  # [blk, lora]
        k_pe = cb[..., m.kv_lora_rank : m.kv_lora_rank + m.qk_rope_head_dim]
        k_nope = jnp.einsum(
            "sl,lhn->shn", c_kv, w_uk, preferred_element_type=jnp.float32
        ).astype(qn.dtype)
        v = jnp.einsum(
            "sl,lhv->shv", c_kv, w_uv, preferred_element_type=jnp.float32
        ).astype(qn.dtype)
        s = jnp.einsum("thn,shn->hts", qn, k_nope, preferred_element_type=jnp.float32)
        s += jnp.einsum("thr,sr->hts", qp, k_pe, preferred_element_type=jnp.float32)
        s *= scale
        k_pos = bi * blk + jax.lax.broadcasted_iota(jnp.int32, (T, blk), 1)
        mask = (k_pos <= q_pos[:, None]) & (k_pos < total)
        s = jnp.where(mask[None], s, NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
        upd = jnp.einsum(
            "hts,shv->htv", p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc = acc * alpha + upd
        return (m_new, l_new, acc), None

    init = (
        jnp.full((H, T, 1), NEG_INF, jnp.float32),
        jnp.zeros((H, T, 1), jnp.float32),
        jnp.zeros((H, T, m.v_head_dim), jnp.float32),
    )
    (m_f, l_f, acc), _ = jax.lax.scan(
        body, init, (jnp.arange(nb, dtype=jnp.int32), blocks)
    )
    out = acc / jnp.maximum(l_f, 1e-20)  # [H, T, v]
    return jnp.moveaxis(out, 0, 1).astype(q_nope.dtype)  # [T, H, v]
