"""Device-side paged KV cache.

TPU-native replacement for the reference's per-task resizable ragged KV buffers
(src/kvcache/transformer_buffer.h ``TransformerBuffer``) and its defragmenting
arena allocator (3rd/bmengine core/allocator.cpp): one statically-shaped paged
pool (vLLM-style, like the reference's own src/kvcache/paged_kvcache.h but as
the primary path), addressed by block tables. Static shapes mean XLA compiles
one program regardless of per-task context lengths; page indirection replaces
resize/defragmentation, and buffer donation of the cache pytree across steps
replaces the reference's in-place CUDA writes.

Layout: per-layer arrays ``[num_slots, kv_heads, head_dim]`` with
``num_slots = num_pages * page_size`` (slot-major). Chosen so that

  * the per-token write is a plain dim-0 row scatter — XLA keeps the donated
    buffer in the default layout, so no layout-conversion copies appear
    between the scatter and the Pallas kernel's custom-call operands
    (head-major storage cost a full cache copy per layer per step);
  * one page is one contiguous ``[page_size, H, D]`` chunk, so the decode
    kernel's HBM->VMEM DMA per page is a single untiled-dim slice (legal for
    any head_dim, lane-aligned or not).

Sharded ``P(None, "tp", None)`` (KV heads over TP). MLA latent cache:
per-layer ``[num_slots, latent_dim]`` (the latent is a single shared "head" —
reference LATENT_CACHE, batch_generator.cpp:594-596).
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
    (exactly one of the two groups is populated). Optional per-(token, head)
    scales when the cache is int8-quantized (reference KVCacheConfig.scale_dtype
    path, transformer_buffer.h:14-16). ``page_size`` is static metadata.
    """

    k: Optional[Arrays] = None          # per layer [N_slots, H, D]; packed: HEAD-MAJOR [H, N_slots, 2D]
    v: Optional[Arrays] = None          # None when packed (V in K's upper lanes)
    latent: Optional[Arrays] = None     # per layer [N_slots, latent]
    k_scale: Optional[Arrays] = None    # per layer [N_slots, H]
    v_scale: Optional[Arrays] = None
    page_size: int = 16
    # lane-packed K|V pool: for head_dim < 128-lane tiles, K and V share one
    # array [N, H, 2D] (K in lanes [:D], V in [D:]) — no lane padding (a
    # D=64 cache stored separately wastes 2x HBM to tile padding) and one DMA
    # per page instead of two.
    packed: bool = False

    def tree_flatten(self):
        return (
            (self.k, self.v, self.latent, self.k_scale, self.v_scale),
            (self.page_size, self.packed),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, page_size=aux[0], packed=aux[1])

    @property
    def _ref(self) -> jax.Array:
        return (self.k or self.latent)[0]

    @property
    def is_latent(self) -> bool:
        return self.latent is not None

    @property
    def num_slots(self) -> int:
        # packed pools are head-major [H, N, 2D]; others slot-major
        if self.packed:
            return self._ref.shape[1]
        return self._ref.shape[0]

    @property
    def num_pages(self) -> int:
        return self.num_slots // self.page_size

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


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _zeros_builder(shape, dtype, fmt):
    return jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=fmt)


def alloc_zeros(shape, dtype, sharding=None) -> jax.Array:
    """Allocate zeros with an explicitly DEFAULT (row-major) layout.

    ``jnp.zeros`` alone lets XLA pick the output layout — on TPU it picks a
    slots-minor layout for 3-D pools, and every later donated step then pays
    two full-array layout-conversion copies per layer reconciling it with the
    Pallas kernels' default-layout operands."""
    if jax.default_backend() not in ("tpu",):
        out = jnp.zeros(shape, dtype)
        return jax.device_put(out, sharding) if sharding is not None else out
    from jax.experimental import layout as XL

    sh = sharding or jax.sharding.SingleDeviceSharding(jax.devices()[0])
    fmt = XL.Format(XL.Layout(major_to_minor=tuple(range(len(shape)))), sh)
    return _zeros_builder(tuple(shape), jnp.dtype(dtype).name, fmt)()


def _use_packed(head_dim: int, quantized: bool) -> bool:
    """Lane-packed head-major K|V pools for any head_dim whose packed width
    tiles the 128-lane registers — including D=128 (the packing is not just
    a padding fix for D<128: it halves pool count and feeds the head-major
    kernel, whose zero-padded-q trick reads K and V in one stream). int8
    caches pack the same way (int8 elements + slot-major scales; the hm_q
    kernel folds scales into scores/probabilities)."""
    import os

    if os.environ.get("ZT_NO_PACKED_KV") == "1":
        return False
    return (2 * head_dim) % 128 == 0


def new_kv_cache(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    kv_sharding=None,
    scale_sharding=None,
) -> KVCache:
    if _use_packed(head_dim, quantized):
        # HEAD-MAJOR [H, N, 2D]: page fetches arrive batch-leading for the
        # decode kernel's batched dots (no per-block transpose), and page
        # write windows (H, S, 2D) are DMA-legal for any head count
        shape = (num_kv_heads, num_pages * page_size, 2 * head_dim)
        store_dtype = jnp.int8 if quantized else dtype
        mk = tuple(
            alloc_zeros(shape, store_dtype, kv_sharding) for _ in range(num_layers)
        )
        if quantized:
            # per-(token, head) absmax scales stay slot-major [N, H]: they
            # scatter layout-neutrally (tiny rows) and the hm_q kernel
            # fetches (S, H) page blocks directly
            sshape = (num_pages * page_size, num_kv_heads)
            mks = lambda: tuple(
                alloc_zeros(sshape, jnp.float32, scale_sharding)
                for _ in range(num_layers)
            )
            return KVCache(
                k=mk, k_scale=mks(), v_scale=mks(),
                page_size=page_size, packed=True,
            )
        return KVCache(k=mk, page_size=page_size, packed=True)
    shape = (num_pages * page_size, num_kv_heads, head_dim)
    store_dtype = jnp.int8 if quantized else dtype
    mk = lambda: tuple(alloc_zeros(shape, store_dtype, kv_sharding) for _ in range(num_layers))
    if quantized:
        sshape = (num_pages * page_size, num_kv_heads)
        mks = lambda: tuple(
            alloc_zeros(sshape, jnp.float32, scale_sharding) for _ in range(num_layers)
        )
        return KVCache(k=mk(), v=mk(), k_scale=mks(), v_scale=mks(), page_size=page_size)
    return KVCache(k=mk(), v=mk(), page_size=page_size)


def new_latent_cache(
    num_layers: int, num_pages: int, page_size: int, latent_dim: int, dtype=jnp.bfloat16,
    sharding=None,
) -> KVCache:
    # feature dim padded to the lane tile so page-granular Pallas DMA writes
    # are legal (Mosaic: 2-D slices must be 128-aligned in the minor dim)
    padded = (latent_dim + 127) // 128 * 128
    shape = (num_pages * page_size, padded)
    return KVCache(
        latent=tuple(alloc_zeros(shape, dtype, sharding) for _ in range(num_layers)),
        page_size=page_size,
    )


def _pallas_writes_on() -> bool:
    """XLA's row scatter prefers a scattered-dim-minor cache layout that
    conflicts with the Pallas attention kernel's default-layout operands,
    costing two full-cache layout copies per layer per step; on TPU writes
    run as Pallas DMA kernels instead (ops/pallas/kv_write.py)."""
    import os

    if os.environ.get("ZT_NO_PALLAS") == "1":
        return False
    return jax.default_backend() == "tpu"


def _rows_tile_aligned(rows: jax.Array) -> bool:
    """Mosaic accepts per-row DMA slices only when the trailing-two-dim
    window is tile-aligned; otherwise the 2-D page-granular kernels run."""
    return rows.ndim == 3 and rows.shape[-2] % 8 == 0 and rows.shape[-1] % 128 == 0


def _scatter_rows(arr: jax.Array, idx: jax.Array, rows: jax.Array) -> jax.Array:
    """Dim-0 row scatter through a 2-D view: merging the minor dims keeps the
    reshape a bitcast and the 2-D row scatter layout-neutral, so XLA doesn't
    flip the cache layout between the scatter and the Pallas attention
    custom-call (which would cost two full-cache copies per layer)."""
    lead = arr.shape[0]
    flat = arr.reshape(lead, -1)
    out = flat.at[idx].set(rows.astype(arr.dtype).reshape(rows.shape[0], -1), mode="drop")
    return out.reshape(arr.shape)


def write_kv(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,  # [T, kv_heads, head_dim]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32 flat slot (= page*page_size + offset); <0 => skip
) -> KVCache:
    """Write new K/V rows into the paged pool (replaces copy_to_rag_buffer2,
    src/kvcache/ragged_buffer_kernel.cu): Pallas in-place DMA kernel on TPU,
    dim-0 XLA scatter elsewhere."""
    feature = k_new.shape[-2] * k_new.shape[-1] if k_new.ndim == 3 else k_new.shape[-1]
    if cache.packed and cache.quantized:
        k_q, k_s = _quantize_rows(k_new)
        v_q, v_s = _quantize_rows(v_new)
        rows = jnp.concatenate([k_q, v_q], axis=-1)  # [T, H, 2D] int8
        if _pallas_writes_on():
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import write_rows_hm_sharded

                kv = write_rows_hm_sharded(
                    cache.k[layer], rows, slot_mapping, cache.page_size
                )
            else:
                from ..ops.pallas.kv_write import write_rows_hm

                kv = write_rows_hm(cache.k[layer], rows, slot_mapping, cache.page_size)
        else:
            idx_hm = jnp.where(slot_mapping >= 0, slot_mapping, cache.num_slots)
            kv = cache.k[layer].at[:, idx_hm].set(
                jnp.swapaxes(rows, 0, 1), mode="drop"
            )
        idx = jnp.where(slot_mapping >= 0, slot_mapping, cache.num_slots)
        return cache.set_layer(
            layer,
            k=kv,
            k_scale=cache.k_scale[layer].at[idx].set(k_s, mode="drop"),
            v_scale=cache.v_scale[layer].at[idx].set(v_s, mode="drop"),
        )
    if cache.packed:
        rows = jnp.concatenate(
            [k_new.astype(cache.k[layer].dtype), v_new.astype(cache.k[layer].dtype)],
            axis=-1,
        )  # [T, H, 2D]
        if _pallas_writes_on():
            from ..parallel import kernel_partitioning_enabled

            if kernel_partitioning_enabled():
                from ..ops.pallas.partitioned import write_rows_hm_sharded

                kv = write_rows_hm_sharded(
                    cache.k[layer], rows, slot_mapping, cache.page_size
                )
            else:
                from ..ops.pallas.kv_write import write_rows_hm

                kv = write_rows_hm(cache.k[layer], rows, slot_mapping, cache.page_size)
        else:
            idx = jnp.where(slot_mapping >= 0, slot_mapping, cache.num_slots)
            kv = cache.k[layer].at[:, idx].set(
                jnp.swapaxes(rows, 0, 1), mode="drop"
            )
        return cache.set_layer(layer, k=kv)

    if not cache.quantized and _pallas_writes_on() and feature % 128 == 0:
        if _rows_tile_aligned(k_new):
            from ..ops.pallas.kv_write import paged_write_rows

            k, v = paged_write_rows(
                cache.k[layer], cache.v[layer], k_new, v_new, slot_mapping, cache.page_size
            )
        else:
            from ..ops.pallas.kv_write import write_rows_2d_pair

            k, v = write_rows_2d_pair(
                cache.k[layer], cache.v[layer], k_new, v_new, slot_mapping, cache.page_size
            )
        return cache.set_layer(layer, k=k, v=v)

    idx = jnp.where(slot_mapping >= 0, slot_mapping, cache.num_slots)  # OOB -> dropped

    if cache.quantized:
        k_q, k_s = _quantize_rows(k_new)
        v_q, v_s = _quantize_rows(v_new)
        return cache.set_layer(
            layer,
            k=_scatter_rows(cache.k[layer], idx, k_q),
            v=_scatter_rows(cache.v[layer], idx, v_q),
            k_scale=cache.k_scale[layer].at[idx].set(k_s, mode="drop"),
            v_scale=cache.v_scale[layer].at[idx].set(v_s, mode="drop"),
        )

    return cache.set_layer(
        layer,
        k=_scatter_rows(cache.k[layer], idx, k_new),
        v=_scatter_rows(cache.v[layer], idx, v_new),
    )


def write_latent(
    cache: KVCache,
    layer: int,
    latent_new: jax.Array,  # [T, latent_dim]
    slot_mapping: jax.Array,  # [T]
) -> KVCache:
    arr = cache.latent[layer]
    pad = arr.shape[1] - latent_new.shape[1]
    if pad:
        latent_new = jnp.pad(latent_new, ((0, 0), (0, pad)))
    if _pallas_writes_on() and arr.shape[1] % 128 == 0:
        from ..parallel import kernel_partitioning_enabled

        if kernel_partitioning_enabled():
            from ..ops.pallas.partitioned import write_rows_2d_sharded as _w2d
        else:
            from ..ops.pallas.kv_write import write_rows_2d as _w2d

        lat = _w2d(arr, latent_new, slot_mapping, cache.page_size)
        return cache.set_layer(layer, latent=lat)

    idx = jnp.where(slot_mapping >= 0, slot_mapping, cache.num_slots)
    return cache.set_layer(layer, latent=arr.at[idx].set(latent_new.astype(arr.dtype), mode="drop"))


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax int8 quantization for the KV cache."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _slot_indices(page_indices: jax.Array, page_size: int) -> jax.Array:
    """[..., pages] page ids -> [..., pages*page_size] slot ids."""
    safe = jnp.maximum(page_indices, 0)
    slots = safe[..., None] * page_size + jnp.arange(page_size, dtype=jnp.int32)
    return slots.reshape(page_indices.shape[:-1] + (page_indices.shape[-1] * page_size,))


def gather_kv(
    cache: KVCache,
    layer: int,
    page_indices: jax.Array,  # [..., pages_per_seq] int32; <0 => padding page
) -> Tuple[jax.Array, jax.Array]:
    """Gather pages into contiguous [..., pages*page_size, kv_heads, head_dim].

    jnp reference path (testing / XLA fallback / prefill); the Pallas decode
    kernel streams pages from HBM instead of materializing this gather.
    """
    slots = _slot_indices(page_indices, cache.page_size)
    if cache.packed:
        kv = jnp.moveaxis(cache.k[layer][:, slots], 0, -2)  # [..., KV, H, 2D]
        d = kv.shape[-1] // 2
        k, v = kv[..., :d], kv[..., d:]
        if cache.quantized:
            ks = cache.k_scale[layer][slots]
            vs = cache.v_scale[layer][slots]
            k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
            v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
        return k, v
    k = cache.k[layer][slots]
    v = cache.v[layer][slots]
    if cache.quantized:
        ks = cache.k_scale[layer][slots]
        vs = cache.v_scale[layer][slots]
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    return k, v


def gather_latent(cache: KVCache, layer: int, page_indices: jax.Array) -> jax.Array:
    """Gather latent pages into [..., pages*page_size, latent_dim]."""
    slots = _slot_indices(page_indices, cache.page_size)
    return cache.latent[layer][slots]
