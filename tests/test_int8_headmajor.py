"""INT8 packed head-major KV cache: kernel parity + write/gather roundtrip.

The hm_q decode kernel (ops/pallas/attn_headmajor.paged_decode_attention_hm_q)
must match the jnp reference attention over the dequantized cache; the packed
write path must roundtrip rows within int8 absmax error (reference
quant_attention.cuh int8 cache semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zhilight_tpu.kvcache.paged import (
    KVCache, gather_kv, new_kv_cache, write_kv,
)
from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.attn_headmajor import paged_decode_attention_hm_q

S = 16


def _quant(x):
    """per-(token, head) absmax int8, mirroring kvcache.paged._quantize_rows"""
    amax = np.max(np.abs(x), axis=-1)
    scale = np.maximum(amax / 127.0, 1e-8)
    q = np.clip(np.round(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


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


@pytest.mark.parametrize("hkv,hq", [(2, 8), (8, 8)])
@pytest.mark.parametrize("sliding_window", [0, 24])
def test_hm_q_matches_dequant_reference(hkv, hq, sliding_window):
    q, k, v, page_tables, context_lens = _setup(Hq=hq, Hkv=hkv)
    scale = 1.0 / np.sqrt(q.shape[-1])
    k_q, k_s = _quant(k)
    v_q, v_s = _quant(v)
    pool = np.concatenate([k_q, v_q], axis=-1).transpose(1, 0, 2)  # [Hkv,N,2D] i8

    got = paged_decode_attention_hm_q(
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(k_s), jnp.asarray(v_s),
        jnp.asarray(page_tables), jnp.asarray(context_lens), S, scale,
        sliding_window=sliding_window, interpret=True,
    )

    # reference over the DEQUANTIZED cache (same values the kernel sees)
    kd = k_q.astype(np.float32) * k_s[..., None]
    vd = v_q.astype(np.float32) * v_s[..., None]
    safe = np.maximum(page_tables, 0)
    B = q.shape[0]
    slots = (safe[..., None] * S + np.arange(S)).reshape(B, -1)
    want = decode_attention(
        jnp.asarray(q), jnp.asarray(kd)[slots], jnp.asarray(vd)[slots],
        jnp.asarray(context_lens), scale, sliding_window,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_packed_quantized_write_gather_roundtrip():
    rng = np.random.RandomState(1)
    H, D, Pg, T = 2, 64, 8, 10
    cache = new_kv_cache(1, Pg, S, H, D, jnp.bfloat16, quantized=True)
    assert cache.packed and cache.quantized
    assert cache.k[0].dtype == jnp.int8
    k_new = rng.randn(T, H, D).astype(np.float32)
    v_new = rng.randn(T, H, D).astype(np.float32)
    slots = np.arange(T, dtype=np.int32)
    slots[3] = -1  # skipped row
    cache = write_kv(cache, 0, jnp.asarray(k_new), jnp.asarray(v_new), jnp.asarray(slots))
    pages = np.arange(Pg, dtype=np.int32)
    k_got, v_got = gather_kv(cache, 0, jnp.asarray(pages))
    k_got = np.asarray(k_got, np.float32)[:T]
    v_got = np.asarray(v_got, np.float32)[:T]
    keep = slots >= 0
    # int8 absmax quantization error ~ amax/127 per element + bf16 dequant
    np.testing.assert_allclose(k_got[keep], k_new[keep], atol=0.04)
    np.testing.assert_allclose(v_got[keep], v_new[keep], atol=0.04)
    assert np.all(k_got[3] == 0) and np.all(v_got[3] == 0)


def test_engine_e2e_int8_cache():
    """Engine end-to-end with kv_dtype=int8 (packed head-major pool on the
    CPU fallback path): greedy outputs match the bf16-cache engine on a tiny
    model where quantization error is below the logit gaps."""
    import jax
    from zhilight_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
    from zhilight_tpu.llm import LLM
    from zhilight_tpu.models import llama as L

    VOCAB, EOS = 64, 1
    cfg = ModelConfig(
        model_type="llama", num_layers=2, dim_model=64, num_heads=4,
        dim_head=64, num_kv_heads=2, dim_ff=128, vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 11, 19)]

    outs = {}
    for kvd in ("bfloat16", "int8"):
        ecfg = EngineConfig(
            max_model_len=64,
            cache=CacheConfig(page_size=4, num_pages=64, kv_dtype=kvd),
            scheduler=SchedulerConfig(
                max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32),
                eos_id=EOS,
            ),
        )
        llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
        if kvd == "int8":
            assert llm.executor.cache.packed and llm.executor.cache.quantized
        gen = DynamicBatchGenerator(llm).start()
        rs = gen.batch_generate(prompts, GeneratorArg(max_length=8))
        outs[kvd] = [r.outputs[0].token_ids for r in rs]
        gen.stop()
    assert outs["bfloat16"] == outs["int8"]
