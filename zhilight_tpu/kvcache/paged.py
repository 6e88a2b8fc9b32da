"""Device-side paged KV cache.

TPU-native replacement for the reference's per-task resizable ragged KV buffers
(src/kvcache/transformer_buffer.h ``TransformerBuffer``) and its defragmenting
arena allocator (3rd/bmengine core/allocator.cpp): one statically-shaped paged
pool (vLLM-style, like the reference's own src/kvcache/paged_kvcache.h but as
the primary path), addressed by block tables. Static shapes mean XLA compiles
one program regardless of per-task context lengths; page indirection replaces
resize/defragmentation, and buffer donation of the cache pytree across steps
replaces the reference's in-place CUDA writes.

Layout: per-layer arrays ``[kv_heads, num_pages, page_size, head_dim]``
(head-major so the Pallas decode kernel DMAs one head's page as a contiguous
``[page_size, head_dim]`` tile), held in tuples (one leaf per layer, so a
layer update touches only its own buffer), sharded ``P("tp", None, None, None)``.
MLA latent cache: per-layer ``[num_pages, page_size, latent_dim]`` (the latent
is a single shared "head" — reference LATENT_CACHE, batch_generator.cpp:594-596).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "KVCache",
    "new_kv_cache",
    "new_latent_cache",
    "write_kv",
    "write_latent",
    "gather_kv",
    "gather_latent",
]

Arrays = Tuple[jax.Array, ...]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class KVCache:
    """Pytree holding the paged pool.

    ``k``/``v`` for standard attention; ``latent`` for MLA compressed cache
    (exactly one of the two groups is populated). Optional per-(head, token)
    scales when the cache is int8-quantized (reference KVCacheConfig.scale_dtype
    path, transformer_buffer.h:14-16).
    """

    k: Optional[Arrays] = None          # per layer [H, P, S, D]
    v: Optional[Arrays] = None
    latent: Optional[Arrays] = None     # per layer [P, S, latent]
    k_scale: Optional[Arrays] = None    # per layer [H, P, S]
    v_scale: Optional[Arrays] = None

    def tree_flatten(self):
        return (self.k, self.v, self.latent, self.k_scale, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def _ref(self) -> jax.Array:
        return (self.k or self.latent)[0]

    @property
    def is_latent(self) -> bool:
        return self.latent is not None

    @property
    def num_pages(self) -> int:
        return self._ref.shape[0] if self.is_latent else self._ref.shape[1]

    @property
    def page_size(self) -> int:
        return self._ref.shape[1] if self.is_latent else self._ref.shape[2]

    @property
    def num_layers(self) -> int:
        return len(self.k if self.k is not None else self.latent)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def set_layer(self, layer: int, **kw) -> "KVCache":
        """Return a new cache with one layer's arrays replaced."""
        updates = {}
        for name, arr in kw.items():
            cur = getattr(self, name)
            updates[name] = cur[:layer] + (arr,) + cur[layer + 1 :]
        return replace(self, **updates)


def new_kv_cache(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    shape = (num_kv_heads, num_pages, page_size, head_dim)
    store_dtype = jnp.int8 if quantized else dtype
    mk = lambda: tuple(jnp.zeros(shape, dtype=store_dtype) for _ in range(num_layers))
    if quantized:
        sshape = (num_kv_heads, num_pages, page_size)
        mks = lambda: tuple(jnp.zeros(sshape, dtype=jnp.float32) for _ in range(num_layers))
        return KVCache(k=mk(), v=mk(), k_scale=mks(), v_scale=mks())
    return KVCache(k=mk(), v=mk())


def new_latent_cache(
    num_layers: int, num_pages: int, page_size: int, latent_dim: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (num_pages, page_size, latent_dim)
    return KVCache(latent=tuple(jnp.zeros(shape, dtype=dtype) for _ in range(num_layers)))


def _scatter_rows_headmajor(layer_arr: jax.Array, idx: jax.Array, rows: jax.Array) -> jax.Array:
    """layer_arr [H, P, S, ...]; rows [T, H, ...]; idx [T] flat (page*S+off).

    Out-of-range indices are dropped.
    """
    H = layer_arr.shape[0]
    flat = layer_arr.reshape((H, -1) + layer_arr.shape[3:])  # [H, P*S, ...]
    rows_hm = jnp.moveaxis(rows.astype(layer_arr.dtype), 1, 0)  # [H, T, ...]
    flat = flat.at[:, idx].set(rows_hm, mode="drop")
    return flat.reshape(layer_arr.shape)


def write_kv(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,  # [T, kv_heads, head_dim]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32 flat slot (= page*page_size + offset); <0 => skip
) -> KVCache:
    """Scatter new K/V rows into the paged pool (replaces copy_to_rag_buffer2,
    src/kvcache/ragged_buffer_kernel.cu, as an XLA scatter)."""
    cap = cache.num_pages * cache.page_size
    idx = jnp.where(slot_mapping >= 0, slot_mapping, cap)  # cap is OOB -> dropped

    if cache.quantized:
        k_q, k_s = _quantize_rows(k_new)
        v_q, v_s = _quantize_rows(v_new)
        return cache.set_layer(
            layer,
            k=_scatter_rows_headmajor(cache.k[layer], idx, k_q),
            v=_scatter_rows_headmajor(cache.v[layer], idx, v_q),
            k_scale=_scatter_rows_headmajor(cache.k_scale[layer], idx, k_s),
            v_scale=_scatter_rows_headmajor(cache.v_scale[layer], idx, v_s),
        )

    return cache.set_layer(
        layer,
        k=_scatter_rows_headmajor(cache.k[layer], idx, k_new),
        v=_scatter_rows_headmajor(cache.v[layer], idx, v_new),
    )


def write_latent(
    cache: KVCache,
    layer: int,
    latent_new: jax.Array,  # [T, latent_dim]
    slot_mapping: jax.Array,  # [T]
) -> KVCache:
    cap = cache.num_pages * cache.page_size
    idx = jnp.where(slot_mapping >= 0, slot_mapping, cap)
    arr = cache.latent[layer]
    flat = arr.reshape((-1,) + arr.shape[2:])
    flat = flat.at[idx].set(latent_new.astype(arr.dtype), mode="drop")
    return cache.set_layer(layer, latent=flat.reshape(arr.shape))


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax int8 quantization for the KV cache."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def gather_kv(
    cache: KVCache,
    layer: int,
    page_indices: jax.Array,  # [..., pages_per_seq] int32; <0 => padding page
) -> Tuple[jax.Array, jax.Array]:
    """Gather pages into contiguous [..., pages*page_size, kv_heads, head_dim].

    jnp reference path (testing / XLA fallback); the Pallas decode kernel
    streams pages from HBM instead of materializing this gather.
    """
    S = cache.page_size
    safe = jnp.maximum(page_indices, 0)
    k = cache.k[layer][:, safe]  # [H, *lead, pages, S, D]
    v = cache.v[layer][:, safe]
    if cache.quantized:
        ks = cache.k_scale[layer][:, safe]
        vs = cache.v_scale[layer][:, safe]
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    # [H, *lead, pages, S, D] -> [*lead, pages*S, H, D]
    k = jnp.moveaxis(k, 0, -2)
    v = jnp.moveaxis(v, 0, -2)
    newshape = page_indices.shape[:-1] + (page_indices.shape[-1] * S,) + k.shape[-2:]
    return k.reshape(newshape), v.reshape(newshape)


def gather_latent(cache: KVCache, layer: int, page_indices: jax.Array) -> jax.Array:
    """Gather latent pages into [..., pages*page_size, latent_dim]."""
    S = cache.page_size
    safe = jnp.maximum(page_indices, 0)
    lat = cache.latent[layer][safe]
    newshape = page_indices.shape[:-1] + (page_indices.shape[-1] * S, lat.shape[-1])
    return lat.reshape(newshape)
