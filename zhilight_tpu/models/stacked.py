"""Layer-stacked forward: ``lax.scan`` over a stacked parameter pytree.

The per-layer Python loop in :mod:`.llama` compiles one Pallas attention +
KV-write instance per layer (40-layer models -> 80+ kernel compilations and a
jaxpr XLA struggles with); homogeneous-layer models instead scan over
parameters stacked on a leading layer axis, so the whole depth compiles THREE
Pallas kernels total and the program is depth-independent.

The KV pool for the stacked path is a single 1-"layer" pool with
``num_layers * pages_per_layer`` pages; the scan body offsets page tables and
slot mappings by ``layer * pages``/``layer * slots`` (the reference's
per-layer TransformerBuffer indexing collapses the same way,
src/kvcache/transformer_buffer.h).

Applicable to models whose decoder layers share one structure: llama /
mistral / qwen2 / qwen3 dense and MiniCPM (uniform MoE stacks could be added
the same way). DeepSeek's mixed dense+MoE depth and MLA use the per-layer
path in :mod:`.llama`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.model_config import ModelConfig
from ..kvcache.paged import KVCache
from .base import DecodeMeta, PrefillMeta
from . import llama as L

__all__ = ["is_stackable", "stack_params", "forward_decode", "forward_prefill", "forward_score", "forward_hidden"]

Params = Dict[str, jax.Array]


def is_stackable(cfg: ModelConfig) -> bool:
    return (
        not cfg.mla.enabled
        and not cfg.moe.enabled
        and not cfg.parallel_residual
        and cfg.rms_norm
    )


def stack_params(cfg: ModelConfig, params: Params, consume: Optional[bool] = None) -> Params:
    """Per-layer dicts -> leaves stacked on a leading [L] axis.

    ``consume`` (default: auto, True for >4GB device models) deletes each
    per-layer device buffer right after its stack materializes, keeping the
    transient device-memory peak at ~(weights + one stacked leaf) instead of
    2x the model. Donation can't help here (a stack output can never alias
    its inputs), and Python references from the caller would otherwise keep
    the originals alive."""
    layers = params["layers"]
    keys = [str(i) for i in range(cfg.num_layers)]
    first = layers[keys[0]]
    if consume is None:
        leaf_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(first))
        consume = (
            jax.default_backend() == "tpu"
            and leaf_bytes * cfg.num_layers > 4 * (1 << 30)
            and all(isinstance(x, jax.Array) for x in jax.tree.leaves(first))
        )

    def stack_leaf(*xs):
        out = jnp.stack(xs)
        if consume:
            out.block_until_ready()
            for x in xs:
                x.delete()
        return out

    stacked = jax.tree.map(stack_leaf, *(layers[k] for k in keys))
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layer_stack"] = stacked
    return out


def _layer_body(cfg: ModelConfig, rope, pages_per_layer: int, mode: str, rot=None):
    """Returns the scan body over (x, cache) with per-layer params + index."""
    slots_per_layer = None  # bound at call time from cache

    def body(carry, xs):
        x, cache, meta = carry
        p, layer = xs
        S = cache.page_size
        n_slots = pages_per_layer * S

        if mode == "decode":
            meta_l = DecodeMeta(
                positions=meta.positions,
                slot_mapping=jnp.where(
                    meta.slot_mapping >= 0, meta.slot_mapping + layer * n_slots, -1
                ),
                page_tables=jnp.where(
                    meta.page_tables >= 0, meta.page_tables + layer * pages_per_layer, -1
                ),
                context_lens=meta.context_lens,
            )
        else:
            meta_l = PrefillMeta(
                positions=meta.positions,
                slot_mapping=jnp.where(
                    meta.slot_mapping >= 0, meta.slot_mapping + layer * n_slots, -1
                ),
                page_table=jnp.where(
                    meta.page_table >= 0, meta.page_table + layer * pages_per_layer, -1
                ),
                cache_len=meta.cache_len,
                q_len=meta.q_len,
            )
        x, cache = L.decoder_layer(p, cfg, rope, x, meta.positions, cache, 0, meta_l, mode, rot=rot)
        return (x, cache, meta), None

    return body


def _backbone(params, cfg, rope, tokens, cache, meta, mode, input_embeddings=None):
    x = L.embed(params, cfg, tokens) if input_embeddings is None else input_embeddings
    pages_per_layer = cache.num_pages // cfg.num_layers
    rot = rope.rot_values(meta.positions)  # shared across the layer scan
    body = _layer_body(cfg, rope, pages_per_layer, mode, rot=rot)
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    # unroll=2: XLA forwards the carried pool buffers between alternating
    # unrolled bodies; unroll=1 copies the whole pool every layer (same
    # finding as the decode-window scan)
    (x, cache, _), _ = jax.lax.scan(
        body, (x, cache, meta), (params["layer_stack"], layer_ids),
        unroll=2 if cfg.num_layers % 2 == 0 else 1,
    )
    return L._norm(params["final_norm"], cfg, x), cache


def forward_decode(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,
    meta: DecodeMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    hidden, cache = _backbone(params, cfg, rope, tokens, cache, meta, "decode")
    return L.get_logits(params, cfg, hidden), cache


def forward_prefill(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,
    meta: PrefillMeta,
    cache: KVCache,
    input_embeddings: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    hidden, cache = _backbone(
        params, cfg, rope, tokens, cache, meta, "prefill", input_embeddings
    )
    last = jnp.maximum(meta.q_len - 1, 0)
    return L.get_logits(params, cfg, hidden[last]), cache


def forward_score(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,
    meta: PrefillMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    hidden, cache = _backbone(params, cfg, rope, tokens, cache, meta, "prefill")
    return L.get_logits(params, cfg, hidden), cache


def forward_hidden(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,
    meta: PrefillMeta,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    hidden, cache = _backbone(params, cfg, rope, tokens, cache, meta, "prefill")
    return hidden, cache


def backbone_chunk(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,
    meta: PrefillMeta,
    cache: KVCache,
    input_embeddings: Optional[jax.Array] = None,
) -> KVCache:
    """Prefill chunk without logits (scheduler pure-chunk iterations)."""
    _, cache = _backbone(
        params, cfg, rope, tokens, cache, meta, "prefill", input_embeddings
    )
    return cache
