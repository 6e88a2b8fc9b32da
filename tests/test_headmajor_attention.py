"""Head-major packed decode kernel vs the jnp reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.attn_headmajor import paged_decode_attention_hm

S = 16


def _setup(B=4, Hq=8, Hkv=2, D=64, P=32, maxp=6, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, Hq, D).astype(np.float32)
    k = rng.randn(P * S, Hkv, D).astype(np.float32)
    v = rng.randn(P * S, Hkv, D).astype(np.float32)
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
    return q, k, v, page_tables, context_lens


@pytest.mark.parametrize("hkv,hq", [(2, 8), (36, 36), (1, 16)])
@pytest.mark.parametrize("sliding_window", [0, 24])
def test_headmajor_matches_reference(hkv, hq, sliding_window):
    q, k, v, page_tables, context_lens = _setup(Hq=hq, Hkv=hkv)
    scale = 1.0 / np.sqrt(q.shape[-1])
    # head-major packed pool [Hkv, N, 2D]
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)

    got = paged_decode_attention_hm(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(page_tables),
        jnp.asarray(context_lens), S, scale, sliding_window=sliding_window,
        interpret=True,
    )

    safe = np.maximum(page_tables, 0)
    B = q.shape[0]
    slots = (safe[..., None] * S + np.arange(S)).reshape(B, -1)
    want = decode_attention(
        jnp.asarray(q), jnp.asarray(k)[slots], jnp.asarray(v)[slots],
        jnp.asarray(context_lens), scale, sliding_window,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


def test_headmajor_empty_slot():
    q, k, v, page_tables, context_lens = _setup(B=3)
    context_lens[1] = 0
    page_tables[1] = -1
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)
    out = paged_decode_attention_hm(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(page_tables),
        jnp.asarray(context_lens), S, 0.125, interpret=True,
    )
    assert not np.any(np.isnan(np.asarray(out)))
