"""Chunked-prefill flash kernel vs the jnp reference (interpret mode).

Covers the parity matrix of ``ops/pallas/prefill_attention``: first chunk,
later chunks (cache_len > 0, non-page-aligned), ragged q_len, GQA group
sizes, sliding window, multi-q-block chunks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zhilight_tpu.ops.attention import prefill_attention
from zhilight_tpu.ops.pallas.prefill_attention import paged_prefill_attention_hm

S = 16


def _setup(T, ctx_total, Hq, Hkv, D, seed=0):
    """Build a chunk of T queries at positions [ctx_total - q_len, ctx_total)
    over a head-major packed pool already holding ctx_total tokens."""
    rng = np.random.RandomState(seed)
    P = (ctx_total + S - 1) // S + 3
    q = rng.randn(T, Hq, D).astype(np.float32)
    k = rng.randn(P * S, Hkv, D).astype(np.float32)
    v = rng.randn(P * S, Hkv, D).astype(np.float32)
    maxp = (ctx_total + S - 1) // S
    pages = rng.permutation(P)[:maxp].astype(np.int32)
    return q, k, v, pages, P


def _run(q, k, v, pages, cache_len, q_len, sliding_window=0):
    Hkv = k.shape[1]
    D = q.shape[-1]
    scale = 1.0 / np.sqrt(D)
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)  # [Hkv, N, 2D]
    got = paged_prefill_attention_hm(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(pages),
        jnp.int32(cache_len), jnp.int32(q_len), S, scale,
        sliding_window=sliding_window, interpret=True,
    )
    slots = (pages[:, None] * S + np.arange(S)).reshape(-1)
    want = prefill_attention(
        jnp.asarray(q), jnp.asarray(k)[slots], jnp.asarray(v)[slots],
        jnp.int32(cache_len), jnp.int32(q_len), scale, sliding_window,
    )
    return np.asarray(got), np.asarray(want)


@pytest.mark.parametrize("hkv,hq", [(2, 8), (4, 4), (1, 16)])
def test_first_chunk_parity(hkv, hq):
    T, q_len = 64, 50
    q, k, v, pages, _ = _setup(T, q_len, hq, hkv, 64)
    got, want = _run(q, k, v, pages, cache_len=0, q_len=q_len)
    np.testing.assert_allclose(got[:q_len], want[:q_len], rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("cache_len", [16, 37, 160])
def test_later_chunk_parity(cache_len):
    """cache_len > 0 incl. non-page-aligned resume points."""
    T, q_len = 32, 29
    q, k, v, pages, _ = _setup(T, cache_len + q_len, 8, 2, 64, seed=cache_len)
    got, want = _run(q, k, v, pages, cache_len=cache_len, q_len=q_len)
    np.testing.assert_allclose(got[:q_len], want[:q_len], rtol=1e-2, atol=1e-2)


def test_multi_qblock_chunk():
    """T large enough for several q blocks (tq = 1024 // G = 256 at G=4)."""
    T = 640
    q, k, v, pages, _ = _setup(T, T, 8, 2, 64, seed=3)
    got, want = _run(q, k, v, pages, cache_len=0, q_len=T)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_sliding_window():
    T, cache_len = 48, 64
    q, k, v, pages, _ = _setup(T, cache_len + T, 4, 4, 64, seed=7)
    got, want = _run(q, k, v, pages, cache_len=cache_len, q_len=T,
                     sliding_window=40)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_d128_packed():
    T = 40
    q, k, v, pages, _ = _setup(T, T, 8, 8, 128, seed=11)
    got, want = _run(q, k, v, pages, cache_len=0, q_len=T)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_empty_tail_padding():
    """q_len much smaller than the bucket: padding rows finite, valid exact."""
    T, q_len = 128, 5
    q, k, v, pages, _ = _setup(T, q_len, 8, 2, 64, seed=13)
    got, want = _run(q, k, v, pages, cache_len=0, q_len=q_len)
    np.testing.assert_allclose(got[:q_len], want[:q_len], rtol=1e-2, atol=1e-2)
    assert np.all(np.isfinite(got))


# ---------------------------------------------------------------------------
# packed multi-sequence variant (encode groups)
# ---------------------------------------------------------------------------

def test_packed_segments_match_single():
    """paged_prefill_attention_hm_packed == per-segment single-sequence runs,
    including zero-length (padded) and cache_len > 0 segments."""
    from zhilight_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_hm_packed,
    )

    rng = np.random.RandomState(3)
    Hkv, G, D = 2, 2, 64
    Hq = Hkv * G
    NS, TC, maxp = 4, 64, 16
    N = NS * maxp
    pool = jnp.asarray(rng.randn(Hkv, N * S, 2 * D), jnp.float32)
    q = jnp.asarray(rng.randn(NS * TC, Hq, D), jnp.float32)
    tables = np.stack([s * maxp + np.arange(maxp) for s in range(NS)]).astype(np.int32)
    cache_lens = np.array([32, 0, 100, 7], np.int32)
    q_lens = np.array([64, 40, 64, 0], np.int32)
    scale = 1.0 / np.sqrt(D)

    out = paged_prefill_attention_hm_packed(
        q, pool, jnp.asarray(tables), jnp.asarray(cache_lens),
        jnp.asarray(q_lens), S, scale, 0, True,
    )
    from zhilight_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_hm as single,
    )

    for s in range(NS):
        ql = int(q_lens[s])
        if not ql:
            continue
        ref = single(
            q[s * TC : (s + 1) * TC], pool, jnp.asarray(tables[s]),
            jnp.int32(cache_lens[s]), jnp.int32(q_lens[s]), S, scale, 0, True,
        )
        np.testing.assert_allclose(
            np.asarray(out[s * TC : (s + 1) * TC][:ql]),
            np.asarray(ref[:ql]),
            rtol=1e-5, atol=1e-5,
        )


def test_packed_uneven_qblocks():
    """TC smaller than a natural q block and NS*TC with per-seg row padding."""
    from zhilight_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_hm_packed,
    )

    rng = np.random.RandomState(4)
    Hkv, G, D = 1, 4, 64
    Hq = Hkv * G
    NS, TC, maxp = 2, 24, 4
    pool = jnp.asarray(rng.randn(Hkv, NS * maxp * S, 2 * D), jnp.float32)
    q = jnp.asarray(rng.randn(NS * TC, Hq, D), jnp.float32)
    tables = np.stack([s * maxp + np.arange(maxp) for s in range(NS)]).astype(np.int32)
    cache_lens = np.array([5, 16], np.int32)
    q_lens = np.array([24, 17], np.int32)
    scale = 1.0 / np.sqrt(D)

    out = paged_prefill_attention_hm_packed(
        q, pool, jnp.asarray(tables), jnp.asarray(cache_lens),
        jnp.asarray(q_lens), S, scale, 0, True,
    )
    k = np.asarray(pool)[:, :, :D].transpose(1, 0, 2)
    v = np.asarray(pool)[:, :, D:].transpose(1, 0, 2)
    for s in range(NS):
        slots = (tables[s][:, None] * S + np.arange(S)).reshape(-1)
        want = prefill_attention(
            q[s * TC : (s + 1) * TC], jnp.asarray(k[slots]), jnp.asarray(v[slots]),
            jnp.int32(cache_lens[s]), jnp.int32(q_lens[s]), scale, 0,
        )
        ql = int(q_lens[s])
        np.testing.assert_allclose(
            np.asarray(out[s * TC : (s + 1) * TC][:ql]),
            np.asarray(want[:ql]),
            rtol=1e-4, atol=1e-4,
        )


# ---------------------------------------------------------------------------
# int8-pool variants (reference quant_attention.cuh prefill semantics)
# ---------------------------------------------------------------------------

def _quant(x):
    amax = np.max(np.abs(x), axis=-1)
    scale = np.maximum(amax / 127.0, 1e-8)
    q = np.clip(np.round(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


@pytest.mark.parametrize("hkv,hq,cache_len", [(2, 8, 0), (8, 8, 40), (4, 4, 7)])
def test_int8_prefill_matches_dequant_reference(hkv, hq, cache_len):
    from zhilight_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_hm_q,
    )

    T, q_len, D = 64, 50, 64
    ctx_total = cache_len + q_len
    q, k, v, pages, P = _setup(T, ctx_total, hq, hkv, D, seed=3)
    scale = 1.0 / np.sqrt(D)
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(v)
    pool = np.concatenate([k_q, v_q], axis=-1).transpose(1, 0, 2)  # [Hkv,N,2D]

    got = paged_prefill_attention_hm_q(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(k_s), jnp.asarray(v_s),
        jnp.asarray(pages), jnp.int32(cache_len), jnp.int32(q_len), S, scale,
        interpret=True,
    )
    kd = k_q.astype(np.float32) * k_s[..., None]
    vd = v_q.astype(np.float32) * v_s[..., None]
    slots = (pages[:, None] * S + np.arange(S)).reshape(-1)
    want = prefill_attention(
        jnp.asarray(q), jnp.asarray(kd)[slots], jnp.asarray(vd)[slots],
        jnp.int32(cache_len), jnp.int32(q_len), scale, 0,
    )
    np.testing.assert_allclose(
        np.asarray(got[:q_len], np.float32), np.asarray(want[:q_len], np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_int8_packed_prefill_matches_single():
    from zhilight_tpu.ops.pallas.prefill_attention import (
        paged_prefill_attention_hm_packed_q,
        paged_prefill_attention_hm_q,
    )

    rng = np.random.RandomState(5)
    NS, TC, Hq, Hkv, D = 2, 32, 8, 4, 64
    cache_lens = np.asarray([20, 0], np.int32)
    q_lens = np.asarray([32, 17], np.int32)
    P = 16
    k = rng.randn(P * S, Hkv, D).astype(np.float32)
    v = rng.randn(P * S, Hkv, D).astype(np.float32)
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(v)
    pool = np.concatenate([k_q, v_q], axis=-1).transpose(1, 0, 2)
    scale = 1.0 / np.sqrt(D)

    q = rng.randn(NS * TC, Hq, D).astype(np.float32)
    maxp = 5
    page_tables = np.full((NS, maxp), -1, np.int32)
    page_tables[0, :4] = [3, 7, 1, 9]
    page_tables[1, :2] = [0, 5]

    got = paged_prefill_attention_hm_packed_q(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(k_s), jnp.asarray(v_s),
        jnp.asarray(page_tables), jnp.asarray(cache_lens), jnp.asarray(q_lens),
        S, scale, interpret=True,
    )
    for s in range(NS):
        want = paged_prefill_attention_hm_q(
            jnp.asarray(q[s * TC : (s + 1) * TC]), jnp.asarray(pool),
            jnp.asarray(k_s), jnp.asarray(v_s),
            jnp.asarray(page_tables[s]), jnp.int32(cache_lens[s]),
            jnp.int32(q_lens[s]), S, scale, interpret=True,
        )
        ql = q_lens[s]
        np.testing.assert_allclose(
            np.asarray(got[s * TC : s * TC + ql], np.float32),
            np.asarray(want[:ql], np.float32), rtol=2e-2, atol=2e-2,
        )
