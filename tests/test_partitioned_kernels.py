"""SPMD partitioning rules for the Pallas kernels, on an 8-device CPU mesh.

The partitioned wrappers must (a) produce the same results as the unsharded
interpret-mode kernels, and (b) actually partition: the per-shard lowering
sees LOCAL head counts, which we assert by checking the compiled HLO has no
all-gather of the pool around the custom call."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.partitioned import (
    paged_decode_attention_hm_sharded,
    write_rows_hm_sharded,
)

S = 16


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("tp",))


def test_attention_partitioned_matches():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    B, Hq, Hkv, D, Pg, maxp = 4, 16, 8, 64, 32, 6
    q = rng.randn(B, Hq, D).astype(np.float32)
    k = rng.randn(Pg * S, Hkv, D).astype(np.float32)
    v = rng.randn(Pg * S, Hkv, D).astype(np.float32)
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)  # [Hkv, N, 2D]
    context_lens = rng.randint(1, maxp * S, size=B).astype(np.int32)
    page_tables = np.full((B, maxp), -1, np.int32)
    used = set()
    for b in range(B):
        for i in range((context_lens[b] + S - 1) // S):
            while True:
                p = rng.randint(0, Pg)
                if p not in used:
                    used.add(p)
                    break
            page_tables[b, i] = p
    scale = 1.0 / np.sqrt(D)

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        q_d = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P(None, "tp", None)))
        pool_d = jax.device_put(jnp.asarray(pool), NamedSharding(mesh, P("tp", None, None)))
        pt_d = jax.device_put(jnp.asarray(page_tables), NamedSharding(mesh, P()))
        cl_d = jax.device_put(jnp.asarray(context_lens), NamedSharding(mesh, P()))

        fn = jax.jit(
            lambda q, pool, pt, cl: paged_decode_attention_hm_sharded(
                q, pool, pt, cl, S, scale, interpret=True
            )
        )
        lowered = fn.lower(q_d, pool_d, pt_d, cl_d)
        hlo = lowered.compile().as_text()
        got = np.asarray(jax.device_get(fn(q_d, pool_d, pt_d, cl_d)))

    # no all-gather of the pool (it is by far the largest array)
    assert "all-gather" not in hlo, "pool was gathered around the kernel"

    safe = np.maximum(page_tables, 0)
    slots = (safe[..., None] * S + np.arange(S)).reshape(B, -1)
    want = decode_attention(
        jnp.asarray(q), jnp.asarray(k)[slots], jnp.asarray(v)[slots],
        jnp.asarray(context_lens), scale, 0,
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-2, atol=1e-2)


def test_write_partitioned_matches():
    mesh = _mesh()
    rng = np.random.RandomState(1)
    H, Pg, X, T = 8, 24, 128, 4
    pool = rng.randn(H, Pg * S, X).astype(np.float32)
    rows = rng.randn(T, H, X).astype(np.float32)
    pages = rng.choice(Pg, size=T, replace=False)
    slots = np.array([pg * S + rng.randint(S) for pg in pages], np.int32)
    slots[1] = -1

    want = pool.copy()
    for t, sl in enumerate(slots):
        if sl >= 0:
            want[:, sl] = rows[t]

    with mesh:
        pool_d = jax.device_put(jnp.asarray(pool), NamedSharding(mesh, P("tp", None, None)))
        rows_d = jax.device_put(jnp.asarray(rows), NamedSharding(mesh, P(None, "tp", None)))
        slots_d = jax.device_put(jnp.asarray(slots), NamedSharding(mesh, P()))
        fn = jax.jit(
            lambda pool, rows, slots: write_rows_hm_sharded(
                pool, rows, slots, S, interpret=True
            )
        )
        hlo = fn.lower(pool_d, rows_d, slots_d).compile().as_text()
        got = np.asarray(jax.device_get(fn(pool_d, rows_d, slots_d)))

    assert "all-gather" not in hlo
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_prefill_partitioned_matches():
    from zhilight_tpu.ops.attention import prefill_attention
    from zhilight_tpu.ops.pallas.partitioned import (
        paged_prefill_attention_hm_sharded,
    )

    mesh = _mesh()
    rng = np.random.RandomState(2)
    T, q_len, cache_len, Hq, Hkv, D = 64, 39, 21, 16, 8, 64
    total = cache_len + q_len
    Pg = (total + S - 1) // S + 2
    maxp = (total + S - 1) // S
    q = rng.randn(T, Hq, D).astype(np.float32)
    k = rng.randn(Pg * S, Hkv, D).astype(np.float32)
    v = rng.randn(Pg * S, Hkv, D).astype(np.float32)
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)
    pages = rng.permutation(Pg)[:maxp].astype(np.int32)
    scale = 1.0 / np.sqrt(D)

    with mesh:
        q_d = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P(None, "tp", None)))
        pool_d = jax.device_put(jnp.asarray(pool), NamedSharding(mesh, P("tp", None, None)))
        pt_d = jax.device_put(jnp.asarray(pages), NamedSharding(mesh, P()))

        fn = jax.jit(
            lambda q, pool, pt: paged_prefill_attention_hm_sharded(
                q, pool, pt, jnp.int32(cache_len), jnp.int32(q_len), S, scale,
                interpret=True,
            )
        )
        hlo = fn.lower(q_d, pool_d, pt_d).compile().as_text()
        got = np.asarray(jax.device_get(fn(q_d, pool_d, pt_d)))

    assert "all-gather" not in hlo, "pool was gathered around the prefill kernel"

    slot_idx = (pages[:, None] * S + np.arange(S)).reshape(-1)
    want = prefill_attention(
        jnp.asarray(q), jnp.asarray(k)[slot_idx], jnp.asarray(v)[slot_idx],
        jnp.int32(cache_len), jnp.int32(q_len), scale, 0,
    )
    np.testing.assert_allclose(
        got[:q_len], np.asarray(want)[:q_len], rtol=1e-2, atol=1e-2
    )


def test_window_partial_and_flush_partitioned():
    """Decode-window side-buffer kernels under SPMD: partial attention and
    the end-of-window flush run per-shard on local heads with no pool
    all-gather, matching the unsharded interpret kernels."""
    from zhilight_tpu.ops.pallas.attn_headmajor import paged_decode_attention_hm
    from zhilight_tpu.ops.pallas.kv_write import flush_side_rows_hm
    from zhilight_tpu.ops.pallas.partitioned import (
        flush_side_rows_hm_sharded,
        paged_decode_attention_hm_partial_sharded,
    )

    mesh = _mesh()
    rng = np.random.RandomState(1)
    B, Hq, Hkv, D, Pg, maxp, Kw = 4, 16, 8, 64, 16, 4, 6
    q = rng.randn(B, Hq, D).astype(np.float32)
    pool = rng.randn(Hkv, Pg * S, 2 * D).astype(np.float32)
    side = rng.randn(B, Hkv, Kw, 2 * D).astype(np.float32)
    pool_lens = rng.randint(1, maxp * S - Kw, size=B).astype(np.int32)
    n_rows = rng.randint(0, Kw + 1, size=B).astype(np.int32)
    page_tables = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
    scale = 1.0 / np.sqrt(D)

    want_part = np.asarray(
        paged_decode_attention_hm(
            jnp.asarray(q), jnp.asarray(pool), jnp.asarray(page_tables),
            jnp.asarray(pool_lens), S, scale, 0, interpret=True,
            emit_partial=True,
        )
    )
    want_pool = np.asarray(
        flush_side_rows_hm(
            jnp.asarray(pool), jnp.asarray(side), jnp.asarray(pool_lens),
            jnp.asarray(n_rows), jnp.asarray(page_tables), S, interpret=True,
        )
    )

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        hspec = NamedSharding(mesh, P("tp", None, None))
        q_d = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P(None, "tp", None)))
        pool_d = jax.device_put(jnp.asarray(pool), hspec)
        side_d = jax.device_put(
            jnp.asarray(side), NamedSharding(mesh, P(None, "tp", None, None))
        )
        rep = NamedSharding(mesh, P())
        pt_d = jax.device_put(jnp.asarray(page_tables), rep)
        pl_d = jax.device_put(jnp.asarray(pool_lens), rep)
        nr_d = jax.device_put(jnp.asarray(n_rows), rep)

        f1 = jax.jit(
            lambda q, pool, pt, cl: paged_decode_attention_hm_partial_sharded(
                q, pool, pt, cl, S, scale, interpret=True
            )
        )
        hlo1 = f1.lower(q_d, pool_d, pt_d, pl_d).compile().as_text()
        got_part = np.asarray(jax.device_get(f1(q_d, pool_d, pt_d, pl_d)))

        f2 = jax.jit(
            lambda pool, side, ep, nr, pt: flush_side_rows_hm_sharded(
                pool, side, ep, nr, pt, S, interpret=True
            )
        )
        hlo2 = f2.lower(pool_d, side_d, pl_d, nr_d, pt_d).compile().as_text()
        got_pool = np.asarray(jax.device_get(f2(pool_d, side_d, pl_d, nr_d, pt_d)))

    assert "all-gather" not in hlo1, "pool gathered around the partial kernel"
    assert "all-gather" not in hlo2, "pool gathered around the flush kernel"
    np.testing.assert_allclose(got_part, want_part, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pool, want_pool, rtol=1e-5, atol=1e-5)


def test_mla_decode_and_flush_partitioned():
    """MLA latent kernels under SPMD: the replicated-pool decode (normal +
    partial) and 2-D flush run per shard with batch/head sharding and no
    pool gather, matching the unsharded interpret kernels."""
    from zhilight_tpu.ops.pallas.kv_write import flush_side_rows_2d
    from zhilight_tpu.ops.pallas.paged_attention import paged_mla_decode
    from zhilight_tpu.ops.pallas.partitioned import (
        flush_side_rows_2d_sharded,
        paged_mla_decode_sharded,
        write_rows_2d_sharded,
    )

    mesh = _mesh()
    rng = np.random.RandomState(2)
    B, H, stored, v_dim, Pg, maxp, Kw = 8, 16, 256, 128, 16, 4, 6
    q = rng.randn(B, H, stored).astype(np.float32)
    pool = rng.randn(Pg * S, stored).astype(np.float32)
    side = rng.randn(B, Kw, stored).astype(np.float32)
    ctx = rng.randint(1, maxp * S - Kw, size=B).astype(np.int32)
    n_rows = rng.randint(0, Kw + 1, size=B).astype(np.int32)
    pt = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp) % Pg
    # make each slot's pages unique (flush correctness needs disjoint pages)
    pt = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
    pool = rng.randn(B * maxp * S, stored).astype(np.float32)
    scale = 0.1

    want_dec = np.asarray(paged_mla_decode(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(pt), jnp.asarray(ctx),
        S, scale, v_dim=v_dim, interpret=True,
    ))
    want_pool = np.asarray(flush_side_rows_2d(
        jnp.asarray(pool), jnp.asarray(side), jnp.asarray(ctx),
        jnp.asarray(n_rows), jnp.asarray(pt), S, interpret=True,
    ))

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        rep = NamedSharding(mesh, P())
        # attention-DP: batch sharded, pool replicated
        q_d = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("tp", None, None)))
        pool_d = jax.device_put(jnp.asarray(pool), rep)
        side_d = jax.device_put(jnp.asarray(side), rep)
        pt_d = jax.device_put(jnp.asarray(pt), NamedSharding(mesh, P("tp", None)))
        ctx_d = jax.device_put(jnp.asarray(ctx), NamedSharding(mesh, P("tp")))
        nr_d = jax.device_put(jnp.asarray(n_rows), rep)
        ctx_rep = jax.device_put(jnp.asarray(ctx), rep)
        pt_rep = jax.device_put(jnp.asarray(pt), rep)

        f1 = jax.jit(
            lambda q, pool, pt, cl: paged_mla_decode_sharded(
                q, pool, pt, cl, S, scale, v_dim, interpret=True
            )
        )
        hlo1 = f1.lower(q_d, pool_d, pt_d, ctx_d).compile().as_text()
        got_dec = np.asarray(jax.device_get(f1(q_d, pool_d, pt_d, ctx_d)))

        f2 = jax.jit(
            lambda pool, side, ep, nr, pt: flush_side_rows_2d_sharded(
                pool, side, ep, nr, pt, S, interpret=True
            )
        )
        got_pool = np.asarray(
            jax.device_get(f2(pool_d, side_d, ctx_rep, nr_d, pt_rep))
        )

    assert "all-gather" not in hlo1, "latent pool gathered around the kernel"
    np.testing.assert_allclose(got_dec, want_dec, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pool, want_pool, rtol=1e-5, atol=1e-5)
