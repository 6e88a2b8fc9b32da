"""Pallas paged decode attention kernel vs the jnp reference (interpret mode).

Covers both kernel variants: the manual double-buffered DMA kernel (default)
and the BlockSpec-pipelined one (use_blockspec=True), over lane-aligned
(D=128) and unaligned (D=64) head dims.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention


def _setup(B=4, Hq=8, Hkv=2, D=128, P=32, S=16, maxp=6, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Hq, D).astype(np.float32)
    # slot-major pools [P*S, Hkv, D]
    k_pages = rng.randn(P * S, Hkv, D).astype(np.float32)
    v_pages = rng.randn(P * S, Hkv, D).astype(np.float32)
    context_lens = rng.randint(1, maxp * S, size=B).astype(np.int32)
    page_tables = np.full((B, maxp), -1, np.int32)
    used = set()
    for b in range(B):
        n = (context_lens[b] + S - 1) // S
        for i in range(n):
            while True:
                p = rng.randint(0, P)
                if p not in used:
                    used.add(p)
                    break
            page_tables[b, i] = p
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(k_pages, dtype),
        jnp.asarray(v_pages, dtype),
        jnp.asarray(page_tables),
        jnp.asarray(context_lens),
    )


def _reference(q, k_pages, v_pages, page_tables, context_lens, S, scale, sliding_window):
    safe = jnp.maximum(page_tables, 0)
    B = q.shape[0]
    slots = (safe[..., None] * S + jnp.arange(S)).reshape(B, -1)
    k = k_pages[slots]  # [B, KV, Hkv, D]
    v = v_pages[slots]
    return decode_attention(q, k, v, context_lens, scale, sliding_window)


@pytest.mark.parametrize("sliding_window", [0, 24])
@pytest.mark.parametrize("ppb", [1, 2, 8])
@pytest.mark.parametrize("D", [128, 64])
@pytest.mark.parametrize("blockspec", [False, True])
def test_paged_attention_matches_reference(sliding_window, ppb, D, blockspec):
    S = 16
    q, k_pages, v_pages, page_tables, context_lens = _setup(D=D, S=S)
    scale = 1.0 / np.sqrt(q.shape[-1])

    got = paged_decode_attention(
        q, k_pages, v_pages, page_tables, context_lens, S, scale,
        sliding_window=sliding_window, pages_per_block=ppb, interpret=True,
        use_blockspec=blockspec,
    )
    want = _reference(q, k_pages, v_pages, page_tables, context_lens, S, scale, sliding_window)

    # CPU XLA matmuls use a bf16 fast path (oneDNN), so both the kernel and the
    # reference sit ~5e-3 from fp64 truth; compare accordingly.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("blockspec", [False, True])
def test_paged_attention_empty_slot(blockspec):
    """Inactive slots (context_len == 0) must not produce NaNs."""
    S = 16
    q, k_pages, v_pages, page_tables, context_lens = _setup(B=3, S=S)
    context_lens = context_lens.at[1].set(0)
    page_tables = page_tables.at[1].set(-1)
    out = paged_decode_attention(
        q, k_pages, v_pages, page_tables, context_lens, S,
        1.0 / np.sqrt(q.shape[-1]), interpret=True, use_blockspec=blockspec,
    )
    assert not np.any(np.isnan(np.asarray(out)))


def test_paged_attention_packed_kv():
    """Lane-packed K|V pool: one [N, H, 2D] array, kernel slices lanes."""
    S = 16
    q, k_pages, v_pages, page_tables, context_lens = _setup(D=64, S=S)
    packed = jnp.concatenate([k_pages, v_pages], axis=-1)  # [N, H, 128]
    scale = 1.0 / np.sqrt(q.shape[-1])
    got = paged_decode_attention(
        q, packed, packed, page_tables, context_lens, S, scale,
        interpret=True, packed=True,
    )
    want = _reference(q, k_pages, v_pages, page_tables, context_lens, S, scale, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


def test_paged_attention_int8_kv():
    """INT8-quantized cache kernel vs dequantized jnp reference."""
    from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention_q

    S = 16
    rng = np.random.RandomState(3)
    B, Hq, Hkv, D, P, maxp = 4, 8, 2, 128, 32, 6
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.float32)
    kf = rng.randn(P * S, Hkv, D).astype(np.float32)
    vf = rng.randn(P * S, Hkv, D).astype(np.float32)
    # quantize per (token, head)
    def quant(x):
        s = np.maximum(np.abs(x).max(-1) / 127.0, 1e-8)
        qx = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
        return qx, s.astype(np.float32)
    kq, ks = quant(kf)
    vq, vs = quant(vf)
    context_lens = rng.randint(1, maxp * S, size=B).astype(np.int32)
    page_tables = np.full((B, maxp), -1, np.int32)
    used = set()
    for b in range(B):
        for i in range((context_lens[b] + S - 1) // S):
            while True:
                p = rng.randint(0, P)
                if p not in used:
                    used.add(p); break
            page_tables[b, i] = p
    scale = 1.0 / np.sqrt(D)
    got = paged_decode_attention_q(
        q, jnp.asarray(kq), jnp.asarray(vq), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(page_tables), jnp.asarray(context_lens), S, scale, interpret=True,
    )
    kd = kq.astype(np.float32) * ks[..., None]
    vd = vq.astype(np.float32) * vs[..., None]
    want = _reference(q, jnp.asarray(kd), jnp.asarray(vd), jnp.asarray(page_tables),
                      jnp.asarray(context_lens), S, scale, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)
