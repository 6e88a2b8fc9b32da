"""Pallas KV-write kernel vs the jnp scatter reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.ops.pallas.kv_write import paged_write_rows


def _ref_scatter(cache, rows, slots):
    idx = jnp.where(slots >= 0, slots, cache.shape[0])
    return cache.at[idx].set(rows.astype(cache.dtype), mode="drop")


@pytest.mark.parametrize("T,desc", [(8, "decode"), (64, "prefill-pages"), (40, "odd")])
def test_write_rows_matches_scatter(T, desc):
    S, N, H, D = 16, 256, 4, 64
    rng = np.random.RandomState(0)
    k_cache = jnp.asarray(rng.randn(N, H, D), jnp.float32)
    v_cache = jnp.asarray(rng.randn(N, H, D), jnp.float32)
    k_rows = jnp.asarray(rng.randn(T, H, D), jnp.float32)
    v_rows = jnp.asarray(rng.randn(T, H, D), jnp.float32)

    if desc == "decode":
        slots = rng.choice(N, size=T, replace=False).astype(np.int32)
        slots[2] = -1  # one inactive slot
    else:
        # prefill layout: page-aligned consecutive runs + -1 padded tail
        slots = np.full(T, -1, np.int32)
        n_valid = T - 7  # partial tail page
        start_pages = rng.choice(N // S - 1, size=(T + S - 1) // S, replace=False)
        for i in range(n_valid):
            slots[i] = start_pages[i // S] * S + i % S
    slots = jnp.asarray(slots)

    gk, gv = paged_write_rows(k_cache, v_cache, k_rows, v_rows, slots, S, interpret=True)
    wk = _ref_scatter(k_cache, k_rows, slots)
    wv = _ref_scatter(v_cache, v_rows, slots)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


@pytest.mark.parametrize("T,X", [(8, 2304), (64, 2304), (8, 576), (64, 576), (48, 36)])
def test_write_rows_2d_matches_scatter(T, X):
    S, N = 16, 256
    rng = np.random.RandomState(2)
    cache = jnp.asarray(rng.randn(N, X), jnp.float32)
    rows = jnp.asarray(rng.randn(T, X), jnp.float32)
    slots = np.full(T, -1, np.int32)
    if T < 2 * S:
        # decode: distinct pages per token
        pages = rng.choice(N // S, size=T, replace=False)
        for t in range(T - 2):  # leave 2 inactive
            slots[t] = pages[t] * S + rng.randint(S)
    else:
        pages = rng.choice(N // S, size=T // S, replace=False)
        n_valid = T - 5  # partial tail page
        for i in range(n_valid):
            slots[i] = pages[i // S] * S + i % S
    slots = jnp.asarray(slots)

    from zhilight_tpu.ops.pallas.kv_write import write_rows_2d

    got = write_rows_2d(cache, rows, slots, S, interpret=True)
    want = _ref_scatter(cache, rows, slots)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("T", [8, 64])
def test_write_rows_2d_pair(T):
    S, N, H, D = 16, 256, 36, 64
    rng = np.random.RandomState(3)
    k_cache = jnp.asarray(rng.randn(N, H, D), jnp.float32)
    v_cache = jnp.asarray(rng.randn(N, H, D), jnp.float32)
    k_rows = jnp.asarray(rng.randn(T, H, D), jnp.float32)
    v_rows = jnp.asarray(rng.randn(T, H, D), jnp.float32)
    slots = np.full(T, -1, np.int32)
    if T < 32:
        pages = rng.choice(N // S, size=T, replace=False)
        for t in range(T - 2):
            slots[t] = pages[t] * S + rng.randint(S)
    else:
        pages = rng.choice(N // S, size=T // S, replace=False)
        for i in range(T - 5):
            slots[i] = pages[i // S] * S + i % S
    slots = jnp.asarray(slots)

    from zhilight_tpu.ops.pallas.kv_write import write_rows_2d_pair

    gk, gv = write_rows_2d_pair(k_cache, v_cache, k_rows, v_rows, slots, S, interpret=True)
    wk = _ref_scatter(k_cache.reshape(N, -1), k_rows.reshape(T, -1), slots).reshape(N, H, D)
    wv = _ref_scatter(v_cache.reshape(N, -1), v_rows.reshape(T, -1), slots).reshape(N, H, D)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))


@pytest.mark.parametrize("T,H", [(1, 4), (8, 36), (16, 12), (64, 36)])
def test_write_rows_hm_matches_scatter(T, H):
    """Head-major pool [H, N, X] writes (decode RMW + prefill page runs)."""
    from zhilight_tpu.ops.pallas.kv_write import write_rows_hm

    S, P, X = 16, 24, 128
    rng = np.random.RandomState(T + H)
    pool = rng.randn(H, P * S, X).astype(np.float32)
    rows = rng.randn(T, H, X).astype(np.float32)
    if T >= 2 * S:
        # prefill contract: page-aligned runs, valid rows form page prefixes
        slots = np.arange(T, dtype=np.int32) + S
        slots[-3:] = -1  # partial tail page
    else:
        # decode contract: each token's page is exclusive to its sequence
        pages = rng.choice(P, size=T, replace=False)
        slots = np.array(
            [pg * S + rng.randint(S) for pg in pages], np.int32
        )
        if T > 2:
            slots[1] = -1  # skipped row

    want = pool.copy()
    for t, sl in enumerate(slots):
        if sl >= 0:
            want[:, sl] = rows[t]

    got = write_rows_hm(
        jnp.asarray(pool), jnp.asarray(rows), jnp.asarray(slots), S, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
