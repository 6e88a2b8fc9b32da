"""Fused write+attend decode kernel vs separate write-then-attend (interpret).

The fused kernel must (a) return the same attention output as writing the new
KV row first and attending over the full context, and (b) leave the pools
identical to what the separate write produced — including skipping frozen
slots (slot_mapping == -1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention_fused

S = 16


def _setup(B=4, Hq=8, Hkv=2, D=64, P=32, maxp=6, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Hq, D).astype(np.float32)
    k_pages = rng.randn(P * S, Hkv, D).astype(np.float32)
    v_pages = rng.randn(P * S, Hkv, D).astype(np.float32)
    k_new = rng.randn(B, Hkv, D).astype(np.float32)
    v_new = rng.randn(B, Hkv, D).astype(np.float32)
    # context_lens INCLUDE the current token; its row is NOT yet in the pool
    context_lens = rng.randint(1, maxp * S, size=B).astype(np.int32)
    page_tables = np.full((B, maxp), -1, np.int32)
    used = set()
    for b in range(B):
        for i in range((context_lens[b] + S - 1) // S):
            while True:
                p = rng.randint(0, P)
                if p not in used:
                    used.add(p)
                    break
            page_tables[b, i] = p
    slots = np.array(
        [
            page_tables[b, (context_lens[b] - 1) // S] * S + (context_lens[b] - 1) % S
            for b in range(B)
        ],
        np.int32,
    )
    return q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots


def _reference(q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots, scale, sw):
    """Write rows first (active slots only), then attend over full context."""
    kp, vp = np.array(k_pages), np.array(v_pages)
    for b, s in enumerate(slots):
        if s >= 0:
            kp[s] = k_new[b]
            vp[s] = v_new[b]
    safe = np.maximum(page_tables, 0)
    B = q.shape[0]
    slot_grid = (safe[..., None] * S + np.arange(S)).reshape(B, -1)
    k = jnp.asarray(kp)[slot_grid]
    v = jnp.asarray(vp)[slot_grid]
    out = decode_attention(
        jnp.asarray(q), k, v, jnp.asarray(context_lens), scale, sw
    )
    return np.asarray(out), kp, vp


@pytest.mark.parametrize("hkv", [2, 12])  # 12: unaligned >8 -> flat-view write-back
@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("frozen", [False, True])
def test_fused_matches_write_then_attend(packed, frozen, hkv):
    q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots = _setup(
        Hq=hkv * 4, Hkv=hkv
    )
    if frozen:
        slots[1] = -1  # frozen slot: no write; its output is discarded anyway
    scale = 1.0 / np.sqrt(q.shape[-1])

    want_out, want_k, want_v = _reference(
        q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots, scale, 0
    )

    if packed:
        pool = jnp.concatenate([jnp.asarray(k_pages), jnp.asarray(v_pages)], axis=-1)
        got, kv, _ = paged_decode_attention_fused(
            jnp.asarray(q), pool, None,
            jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots),
            jnp.asarray(page_tables), jnp.asarray(context_lens),
            S, scale, interpret=True,
        )
        got_k = np.asarray(kv[..., : q.shape[-1]])
        got_v = np.asarray(kv[..., q.shape[-1] :])
    else:
        got, ko, vo = paged_decode_attention_fused(
            jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots),
            jnp.asarray(page_tables), jnp.asarray(context_lens),
            S, scale, interpret=True,
        )
        got_k, got_v = np.asarray(ko), np.asarray(vo)

    active = [b for b in range(len(slots)) if slots[b] >= 0]
    np.testing.assert_allclose(
        np.asarray(got)[active], want_out[active], rtol=1e-2, atol=1e-2
    )
    np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-5, atol=1e-5)


def test_fused_sliding_window():
    q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots = _setup(seed=3)
    scale = 1.0 / np.sqrt(q.shape[-1])
    sw = 24
    want_out, _, _ = _reference(
        q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots, scale, sw
    )
    got, _, _ = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots),
        jnp.asarray(page_tables), jnp.asarray(context_lens),
        S, scale, sliding_window=sw, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want_out, rtol=1e-2, atol=1e-2)


def test_fused_mla_latent():
    """Fused MLA latent decode vs write-then-paged_mla_decode (interpret)."""
    from zhilight_tpu.ops.pallas.paged_attention import (
        paged_mla_decode,
        paged_mla_decode_fused,
    )

    rng = np.random.RandomState(7)
    B, H, lora, rope_d, P, maxp = 4, 8, 128, 64, 32, 6
    stored = ((lora + rope_d) + 127) // 128 * 128
    q_eff = rng.randn(B, H, lora + rope_d).astype(np.float32)
    pool = rng.randn(P * S, stored).astype(np.float32)
    latent_new = rng.randn(B, lora + rope_d).astype(np.float32)
    context_lens = rng.randint(1, maxp * S, size=B).astype(np.int32)
    page_tables = np.full((B, maxp), -1, np.int32)
    used = set()
    for b in range(B):
        for i in range((context_lens[b] + S - 1) // S):
            while True:
                p = rng.randint(0, P)
                if p not in used:
                    used.add(p)
                    break
            page_tables[b, i] = p
    slots = np.array(
        [
            page_tables[b, (context_lens[b] - 1) // S] * S + (context_lens[b] - 1) % S
            for b in range(B)
        ],
        np.int32,
    )
    scale = 1.0 / np.sqrt(lora + rope_d)

    # reference: write rows (padded) then attend
    pool_ref = pool.copy()
    padded_new = np.zeros((B, stored), np.float32)
    padded_new[:, : lora + rope_d] = latent_new
    for b, s in enumerate(slots):
        pool_ref[s] = padded_new[b]
    want = paged_mla_decode(
        jnp.asarray(q_eff), jnp.asarray(pool_ref), jnp.asarray(page_tables),
        jnp.asarray(context_lens), S, scale, v_dim=lora, interpret=True,
    )

    got, got_pool = paged_mla_decode_fused(
        jnp.asarray(q_eff), jnp.asarray(pool), jnp.asarray(latent_new),
        jnp.asarray(slots), jnp.asarray(page_tables), jnp.asarray(context_lens),
        S, scale, v_dim=lora, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_pool), pool_ref, rtol=1e-5, atol=1e-5)


def test_fused_single_token_context():
    """ctx == 1: the only attendable token is the one being written."""
    q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots = _setup(seed=5)
    context_lens[:] = 1
    slots = np.array(
        [page_tables[b, 0] * S for b in range(len(slots))], np.int32
    )
    scale = 1.0 / np.sqrt(q.shape[-1])
    want_out, _, _ = _reference(
        q, k_pages, v_pages, k_new, v_new, page_tables, context_lens, slots, scale, 0
    )
    got, _, _ = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots),
        jnp.asarray(page_tables), jnp.asarray(context_lens),
        S, scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want_out, rtol=1e-2, atol=1e-2)
