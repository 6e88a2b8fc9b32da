"""SPMD partitioning rules for the hot Pallas kernels.

XLA's partitioner treats custom calls (every ``pallas_call``) as opaque:
under ``jit`` on a TP mesh it would all-gather the head-sharded KV pool
around the decode attention kernel and re-shard afterwards — exactly the
collective traffic tensor parallelism exists to avoid. These wrappers attach
:func:`jax.experimental.custom_partitioning` rules so the kernels run
per-shard on their LOCAL heads (decode attention and the paged KV write are
embarrassingly parallel over the head dim; batch sharding — attention-DP —
is likewise local because every shard holds the full pool).

Replaces the reference's explicit per-rank kernel launches (one NCCL rank
per GPU runs its head slice of the fused decode kernel,
attention_kernel.cu + DistLayout head sharding) with a partitioning rule the
SPMD pass applies inside one global program.
"""

from __future__ import annotations

import jax
from jax.experimental.custom_partitioning import custom_partitioning

from .attn_headmajor import (
    paged_decode_attention_hm as _attn_hm,
    paged_decode_attention_hm_q as _attn_hm_q,
)
from .kv_write import write_rows_hm as _write_hm
from .prefill_attention import (
    paged_prefill_attention_hm as _prefill_hm,
    paged_prefill_attention_hm_packed as _prefill_hm_packed,
    paged_prefill_attention_hm_packed_q as _prefill_hm_packed_q,
    paged_prefill_attention_hm_q as _prefill_hm_q,
)

__all__ = [
    "paged_decode_attention_hm_sharded",
    "paged_decode_attention_hm_q_sharded",
    "paged_decode_attention_hm_partial_sharded",
    "paged_decode_attention_hm_q_partial_sharded",
    "paged_prefill_attention_hm_sharded",
    "paged_prefill_attention_hm_packed_sharded",
    "paged_prefill_attention_hm_q_sharded",
    "paged_prefill_attention_hm_packed_q_sharded",
    "write_rows_hm_sharded",
    "flush_side_rows_hm_sharded",
    "paged_mla_decode_sharded",
    "write_rows_2d_sharded",
    "flush_side_rows_2d_sharded",
]


def _shardings(tree):
    return jax.tree.map(lambda x: x.sharding, tree)


def paged_decode_attention_hm_sharded(
    q, kv_pool, page_tables, context_lens, page_size, scale,
    sliding_window=0, fetch_pages=None, interpret=False,
):
    """paged_decode_attention_hm with an SPMD rule: head-sharded q/pool (and
    batch-sharded metadata, for attention-DP) run the kernel per shard.

    q heads are laid out kv-head-major (``q.reshape(B, Hkv, G, D)``), so the
    q head dim factors as ``(h g)`` and a ``tp`` axis on it propagates to the
    pool's leading (kv head) dim.
    """

    def _impl(q, pool, pt, cl):
        return _attn_hm(
            q, pool, pt, cl, page_size, scale,
            sliding_window=sliding_window, fetch_pages=fetch_pages,
            interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, pt, cl):
            return _impl(q, pool, pt, cl)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    # sdy rejects compound factors with a size-1 member: MHA (G == 1) uses
    # the plain h rule
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="b h d, h n x, b m, b -> b h d",
            need_replication_factors=("d", "n", "x", "m"),
        )
    else:
        f.def_partition(
            partition,
            # h appears alone in the pool's leading dim, so only g's size is a
            # free factor the rule needs
            sharding_rule="b (h g) d, h n x, b m, b -> b (h g) d",
            need_replication_factors=("d", "n", "x", "m"),  # first-appearance order
            g=G,
        )
    return f(q, kv_pool, page_tables, context_lens)


def paged_decode_attention_hm_q_sharded(
    q, kv_pool, k_scales, v_scales, page_tables, context_lens, page_size,
    scale, sliding_window=0, fetch_pages=None, interpret=False,
):
    """paged_decode_attention_hm_q with an SPMD rule: the int8 pool shards
    its kv-head dim, the slot-major [N, Hkv] scales shard their HEAD dim
    (dim 1) alongside it; batch metadata may shard for attention-DP."""

    def _impl(q, pool, ks, vs, pt, cl):
        return _attn_hm_q(
            q, pool, ks, vs, pt, cl, page_size, scale,
            sliding_window=sliding_window, fetch_pages=fetch_pages,
            interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, ks, vs, pt, cl):
            return _impl(q, pool, ks, vs, pt, cl)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="b h d, h n x, n h, n h, b m, b -> b h d",
            need_replication_factors=("d", "n", "x", "m"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="b (h g) d, h n x, n h, n h, b m, b -> b (h g) d",
            need_replication_factors=("d", "n", "x", "m"),
            g=G,
        )
    return f(q, kv_pool, k_scales, v_scales, page_tables, context_lens)


def paged_prefill_attention_hm_sharded(
    q, kv_pool, page_table, cache_len, q_len, page_size, scale,
    sliding_window=0, interpret=False,
):
    """paged_prefill_attention_hm with an SPMD rule: head-sharded q/pool run
    the flash prefill kernel per shard. The token dim stays replicated (every
    shard needs the full chunk's causal geometry); cache_len/q_len travel as
    one replicated [2] meta array so every operand has a rank."""
    import jax.numpy as jnp

    meta = jnp.stack([jnp.int32(cache_len), jnp.int32(q_len)])

    def _impl(q, pool, pt, meta):
        return _prefill_hm(
            q, pool, pt, meta[0], meta[1], page_size, scale,
            sliding_window=sliding_window, interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, pt, meta):
            return _impl(q, pool, pt, meta)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="t h d, h n x, m, s -> t h d",
            need_replication_factors=("t", "d", "n", "x", "m", "s"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="t (h g) d, h n x, m, s -> t (h g) d",
            need_replication_factors=("t", "d", "n", "x", "m", "s"),
            g=G,
        )
    return f(q, kv_pool, page_table, meta)


def paged_prefill_attention_hm_packed_sharded(
    q, kv_pool, page_tables, cache_lens, q_lens, page_size, scale,
    sliding_window=0, interpret=False,
):
    """paged_prefill_attention_hm_packed with an SPMD rule: head-sharded
    q/pool run the packed (multi-sequence) flash prefill per shard; the token
    dim and per-segment metadata stay replicated."""

    def _impl(q, pool, pts, cls, qls):
        return _prefill_hm_packed(
            q, pool, pts, cls, qls, page_size, scale,
            sliding_window=sliding_window, interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, pts, cls, qls):
            return _impl(q, pool, pts, cls, qls)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="t h d, h n x, s p, s, s -> t h d",
            need_replication_factors=("t", "d", "n", "x", "s", "p"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="t (h g) d, h n x, s p, s, s -> t (h g) d",
            need_replication_factors=("t", "d", "n", "x", "s", "p"),
            g=G,
        )
    return f(q, kv_pool, page_tables, cache_lens, q_lens)


def paged_prefill_attention_hm_q_sharded(
    q, kv_pool, k_scales, v_scales, page_table, cache_len, q_len, page_size,
    scale, sliding_window=0, interpret=False,
):
    """paged_prefill_attention_hm_q (int8 pool) with an SPMD rule: the pool's
    kv-head dim and the slot-major [N, Hkv] scales' head dim shard together."""
    import jax.numpy as jnp

    meta = jnp.stack([jnp.int32(cache_len), jnp.int32(q_len)])

    def _impl(q, pool, ks, vs, pt, meta):
        return _prefill_hm_q(
            q, pool, ks, vs, pt, meta[0], meta[1], page_size, scale,
            sliding_window=sliding_window, interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, ks, vs, pt, meta):
            return _impl(q, pool, ks, vs, pt, meta)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="t h d, h n x, n h, n h, m, s -> t h d",
            need_replication_factors=("t", "d", "n", "x", "m", "s"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="t (h g) d, h n x, n h, n h, m, s -> t (h g) d",
            need_replication_factors=("t", "d", "n", "x", "m", "s"),
            g=G,
        )
    return f(q, kv_pool, k_scales, v_scales, page_table, meta)


def paged_prefill_attention_hm_packed_q_sharded(
    q, kv_pool, k_scales, v_scales, page_tables, cache_lens, q_lens,
    page_size, scale, sliding_window=0, interpret=False,
):
    """packed int8 flash prefill with the head-sharded SPMD rule."""

    def _impl(q, pool, ks, vs, pts, cls, qls):
        return _prefill_hm_packed_q(
            q, pool, ks, vs, pts, cls, qls, page_size, scale,
            sliding_window=sliding_window, interpret=interpret,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, ks, vs, pts, cls, qls):
            return _impl(q, pool, ks, vs, pts, cls, qls)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="t h d, h n x, n h, n h, s p, s, s -> t h d",
            need_replication_factors=("t", "d", "n", "x", "s", "p"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="t (h g) d, h n x, n h, n h, s p, s, s -> t (h g) d",
            need_replication_factors=("t", "d", "n", "x", "s", "p"),
            g=G,
        )
    return f(q, kv_pool, k_scales, v_scales, page_tables, cache_lens, q_lens)


def write_rows_hm_sharded(pool, rows, slot_mapping, page_size, interpret=False):
    """write_rows_hm with an SPMD rule: each shard writes its local heads."""

    def _impl(pool, rows, slots):
        return _write_hm(pool, rows, slots, page_size, interpret=interpret)

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(pool, rows, slots):
            return _impl(pool, rows, slots)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    f.def_partition(
        partition,
        sharding_rule="h n x, t h x, t -> h n x",
        need_replication_factors=("n", "x", "t"),  # first-appearance order
    )
    return f(pool, rows, slot_mapping)


def paged_decode_attention_hm_partial_sharded(
    q, kv_pool, page_tables, pool_lens, page_size, scale, interpret=False,
):
    """emit_partial variant of paged_decode_attention_hm_sharded for the
    decode-window side-buffer path: per-shard flash partials
    [B, Hkv_local, G, 2D] fp32 merge with the (head-sharded) XLA side
    attention downstream, so no collective is needed here either."""

    def _impl(q, pool, pt, cl):
        return _attn_hm(
            q, pool, pt, cl, page_size, scale, 0,
            interpret=interpret, emit_partial=True,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, pt, cl):
            return _impl(q, pool, pt, cl)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="b h d, h n x, b m, b -> b h g x",
            need_replication_factors=("d", "n", "x", "m", "g"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="b (h g) d, h n x, b m, b -> b h g x",
            need_replication_factors=("d", "n", "x", "m"),
        )
    return f(q, kv_pool, page_tables, pool_lens)


def flush_side_rows_hm_sharded(
    pool, side, entry_pos, n_rows, page_tables, page_size, interpret=False,
):
    """flush_side_rows_hm with an SPMD rule: pool and side rows both shard
    their kv-head dim, so each shard flushes its local heads."""
    from .kv_write import flush_side_rows_hm as _flush

    def _impl(pool, side, ep, nr, pt):
        return _flush(pool, side, ep, nr, pt, page_size, interpret=interpret)

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(pool, side, ep, nr, pt):
            return _impl(pool, side, ep, nr, pt)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    f.def_partition(
        partition,
        # 'b' must replicate: the output pool carries no batch dim, so a
        # batch-sharded side buffer would flush only local slots per replica
        sharding_rule="h n x, b h k x, b, b, b m -> h n x",
        need_replication_factors=("n", "x", "b", "k", "m"),  # first-appearance order
    )
    return f(pool, side, entry_pos, n_rows, page_tables)


def paged_decode_attention_hm_q_partial_sharded(
    q, kv_pool, k_scales, v_scales, page_tables, pool_lens, page_size, scale,
    interpret=False,
):
    """emit_partial variant of paged_decode_attention_hm_q_sharded (int8
    pool) for the decode-window side-buffer path."""

    def _impl(q, pool, ks, vs, pt, cl):
        return _attn_hm_q(
            q, pool, ks, vs, pt, cl, page_size, scale, 0,
            interpret=interpret, emit_partial=True,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, ks, vs, pt, cl):
            return _impl(q, pool, ks, vs, pt, cl)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    G = q.shape[1] // kv_pool.shape[0]
    if G == 1:
        f.def_partition(
            partition,
            sharding_rule="b h d, h n x, n h, n h, b m, b -> b h g x",
            need_replication_factors=("d", "n", "x", "m", "g"),
        )
    else:
        f.def_partition(
            partition,
            sharding_rule="b (h g) d, h n x, n h, n h, b m, b -> b h g x",
            need_replication_factors=("d", "n", "x", "m"),
        )
    return f(q, kv_pool, k_scales, v_scales, page_tables, pool_lens)


def paged_mla_decode_sharded(
    q_eff, latent_pool, page_tables, context_lens, page_size, scale, v_dim,
    interpret=False, emit_partial=False,
):
    """paged_mla_decode with an SPMD rule: the single latent pool is
    replicated, so batch (attention-DP) and the absorbed q-head dim both
    shard freely — each shard attends its local rows/heads over its pool
    replica (reference ATTN_DATA_PARALLEL batch slicing)."""
    from .paged_attention import paged_mla_decode

    def _impl(q, pool, pt, cl):
        return paged_mla_decode(
            q, pool, pt, cl, page_size, scale, v_dim=v_dim,
            interpret=interpret, emit_partial=emit_partial,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(q, pool, pt, cl):
            return _impl(q, pool, pt, cl)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    f.def_partition(
        partition,
        sharding_rule="b h s, n s, b m, b -> b h v",
        need_replication_factors=("s", "n", "m", "v"),
    )
    return f(q_eff, latent_pool, page_tables, context_lens)


def w4a16_moe_experts_sharded(
    x, flat_experts, pair_weights, expert_arrays, fused, top_k, act,
    interpret=False, has_perm=False,
):
    """Fused W4A16 grouped MoE experts under expert-sharded meshes
    (reference GPTQMOE composed with MOE_EXP_PARALLEL,
    src/nn/feedforward/feedforward.cpp:251-267,967-1075).

    The expert stacks ``(w_p, scales, zeros)`` per projection shard their
    leading expert dim; every shard runs the ragged quant kernel over its
    LOCAL experts for all routed (token, k) pairs — remote pairs fall into
    the layout's overflow bucket and cost nothing — then contributes via
    psum. Communication is one [T, D] all-reduce per MoE layer (token-sized),
    never expert-weight-sized; expert bytes stream locally at 4 bits/weight.

    ``expert_arrays``: [gate_up|gate, (up,) down] x (w_p, scales, zeros).
    Returns the weighted routed output [T, D] fp32.
    """
    from ...models.moe import quant_experts_contribution

    def _impl(x, fe, pw, *ws):
        return quant_experts_contribution(
            x, fe, pw, ws, fused, top_k, 0, act, interpret=interpret,
            has_perm=has_perm,
        )

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        espec = arg_shapes[3].sharding.spec  # w_p of the first projection
        axis = espec[0] if len(espec) > 0 else None

        def lower_fn(x, fe, pw, *ws):
            if axis is None:
                return quant_experts_contribution(
                    x, fe, pw, ws, fused, top_k, 0, act, interpret=interpret,
                    has_perm=has_perm,
                )
            names = axis if isinstance(axis, tuple) else (axis,)
            idx = jax.lax.axis_index(names[0])
            for nm in names[1:]:
                idx = idx * mesh.shape[nm] + jax.lax.axis_index(nm)
            e0 = idx * ws[0].shape[0]
            local = quant_experts_contribution(
                x, fe, pw, ws, fused, top_k, e0, act, interpret=interpret,
                has_perm=has_perm,
            )
            return jax.lax.psum(local, names)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    # operand rule: x, flat, weights, then per projection (w_p, scales,
    # zeros[, perm]) — all factors replicated except the expert dim e.
    # need_replication_factors must list factors in FIRST-APPEARANCE order.
    nproj = 2 if fused else 3
    segs, reps = ["t d", "r", "r"], ["t", "d", "r"]
    for i in range(nproj):
        last = i == nproj - 1
        nd = "d" if last else f"n{i}"
        segs += [f"e k{i} {nd}", f"e g{i} {nd}", f"e h{i} {nd}"]
        reps += [f"k{i}"] + ([] if last else [nd]) + [f"g{i}", f"h{i}"]
        if has_perm:
            segs.append(f"e q{i}")
            reps.append(f"q{i}")
    rule = ", ".join(segs) + " -> t d"
    f.def_partition(
        partition, sharding_rule=rule, need_replication_factors=tuple(reps)
    )
    return f(x, flat_experts, pair_weights, *expert_arrays)


def write_rows_2d_sharded(pool, rows, slot_mapping, page_size, interpret=False):
    """write_rows_2d with an SPMD rule: the 2-D (latent) pool is replicated,
    so every shard applies the identical row writes to its replica."""
    from .kv_write import write_rows_2d

    def _impl(pool, rows, slots):
        return write_rows_2d(pool, rows, slots, page_size, interpret=interpret)

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(pool, rows, slots):
            return _impl(pool, rows, slots)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    f.def_partition(
        partition,
        sharding_rule="n x, t x, t -> n x",
        need_replication_factors=("n", "x", "t"),
    )
    return f(pool, rows, slot_mapping)


def flush_side_rows_2d_sharded(
    pool, side, entry_pos, n_rows, page_tables, page_size, interpret=False,
):
    """flush_side_rows_2d with an SPMD rule: replicated latent pool, so the
    side buffer replicates too and every shard flushes identically."""
    from .kv_write import flush_side_rows_2d

    def _impl(pool, side, ep, nr, pt):
        return flush_side_rows_2d(pool, side, ep, nr, pt, page_size,
                                  interpret=interpret)

    f = custom_partitioning(_impl)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(pool, side, ep, nr, pt):
            return _impl(pool, side, ep, nr, pt)

        return mesh, lower_fn, result_shape.sharding, _shardings(tuple(arg_shapes))

    f.def_partition(
        partition,
        sharding_rule="n x, b k x, b, b, b m -> n x",
        need_replication_factors=("n", "x", "b", "k", "m"),
    )
    return f(pool, side, entry_pos, n_rows, page_tables)
