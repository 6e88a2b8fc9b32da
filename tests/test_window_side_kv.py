"""Window-batched KV writes (decode side buffer): parity vs per-step writes.

The decode window path defers pool writes: each step's K/V rows accumulate in
per-layer side buffers (models/llama.py forward_decode_window), attention
merges Pallas pool partials with the XLA-attended side rows, and
flush_window_rows RMWs each slot's <=2 touched pages once per window
(ops/pallas/kv_write.py flush_side_rows_hm). Reference: the per-token write
kernels it replaces are copy_to_rag_buffer2-class
(src/kvcache/ragged_buffer_kernel.cu); the batching itself is TPU-native
(write-kernel invocations are latency-bound on v5e).

Pallas kernels run in interpret mode (CPU). The baseline is the same model
stepping one token at a time through forward_decode with ZT_NO_PALLAS (XLA
gather attention + scatter writes), which is the engine's tested CPU path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import ModelConfig
from zhilight_tpu.kvcache.paged import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta

B, S, KW = 4, 16, 6
HKV, G, D = 2, 2, 64
LAYERS = 2
MAXP = 4


def _fresh_cache(cfg):
    cache = new_kv_cache(
        cfg.num_layers, B * MAXP, S, cfg.num_kv_heads, cfg.dim_head, jnp.float32
    )
    assert cache.packed
    return cache


def _prefill_naive(cfg, params, rope, cache, prompts, page_tables):
    """Write prompt KV through the XLA scatter path, one token at a time."""
    import os

    os.environ["ZT_NO_PALLAS"] = "1"
    try:
        for b, toks in enumerate(prompts):
            for pos, t in enumerate(toks):
                pt = np.full((B, MAXP), -1, np.int32)
                pt[b] = page_tables[b]
                meta = DecodeMeta(
                    positions=jnp.asarray(np.where(np.arange(B) == b, pos, 0), jnp.int32),
                    slot_mapping=jnp.asarray(
                        np.where(
                            np.arange(B) == b,
                            page_tables[b][pos // S] * S + pos % S,
                            -1,
                        ),
                        jnp.int32,
                    ),
                    page_tables=jnp.asarray(pt),
                    context_lens=jnp.asarray(
                        np.where(np.arange(B) == b, pos + 1, 0), jnp.int32
                    ),
                )
                _, cache = L.forward_decode(
                    params, cfg, rope,
                    jnp.asarray(np.where(np.arange(B) == b, t, 0), jnp.int32),
                    meta, cache,
                )
    finally:
        del os.environ["ZT_NO_PALLAS"]
    return cache


def test_window_parity_vs_per_step():
    import os

    cfg = ModelConfig(
        model_type="llama", num_layers=LAYERS, dim_model=HKV * G * D,
        num_heads=HKV * G, dim_head=D, num_kv_heads=HKV, dim_ff=128,
        vocab_size=128, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rope = L.build_rope(cfg)

    rng = np.random.RandomState(0)
    page_tables = np.arange(B * MAXP, dtype=np.int32).reshape(B, MAXP)
    # varied entry contexts: mid-page, page-aligned, end-of-page, short
    ctx0 = np.array([13, 16, 31, 3], np.int32)
    prompts = [list(rng.randint(2, 100, size=int(c))) for c in ctx0]
    # limits: slot 2 freezes after 2 window steps
    limits = np.array([64, 64, int(ctx0[2]) + 2, 64], np.int32)

    cache_a = _prefill_naive(cfg, params, rope, _fresh_cache(cfg), prompts, page_tables)
    cache_b = jax.tree.map(lambda x: x + 0, cache_a)

    tokens = np.array([5, 7, 11, 13], np.int32)

    # ---- baseline: per-step forward_decode through the XLA fallback -------
    os.environ["ZT_NO_PALLAS"] = "1"
    try:
        logits_a = []
        pos = ctx0.copy()
        ctx = ctx0.copy()
        tok = tokens.copy()
        for k in range(KW):
            valid = ctx + 1 <= limits
            meta = DecodeMeta(
                positions=jnp.asarray(pos),
                slot_mapping=jnp.asarray(
                    np.where(valid, page_tables[np.arange(B), pos // S] * S + pos % S, -1)
                ),
                page_tables=jnp.asarray(page_tables),
                context_lens=jnp.asarray(np.where(valid, ctx + 1, ctx)),
            )
            lg, cache_a = L.forward_decode(
                params, cfg, rope, jnp.asarray(tok), meta, cache_a
            )
            lg = np.asarray(lg)
            logits_a.append(lg)
            nxt = lg.argmax(-1).astype(np.int32)
            tok = np.where(valid, nxt, tok)
            pos = np.where(valid, pos + 1, pos)
            ctx = np.where(valid, ctx + 1, ctx)
    finally:
        del os.environ["ZT_NO_PALLAS"]

    # ---- window path: side buffers + partial kernel + end flush -----------
    os.environ["ZT_PALLAS_INTERPRET"] = "1"
    try:
        side_rows = L.new_side_rows(cfg, B, KW, jnp.float32)
        side_valid = jnp.zeros((B, KW), bool)
        pool_lens = jnp.asarray(ctx0)
        entry_pos = jnp.asarray(ctx0)  # first window row position
        logits_b = []
        pos = ctx0.copy()
        ctx = ctx0.copy()
        tok = tokens.copy()
        for k in range(KW):
            valid = ctx + 1 <= limits
            side_valid = side_valid.at[:, k].set(jnp.asarray(valid))
            meta = DecodeMeta(
                positions=jnp.asarray(pos),
                slot_mapping=jnp.asarray(
                    np.where(valid, page_tables[np.arange(B), pos // S] * S + pos % S, -1)
                ),
                page_tables=jnp.asarray(page_tables),
                context_lens=jnp.asarray(np.where(valid, ctx + 1, ctx)),
            )
            lg, cache_b, side_rows = L.forward_decode_window(
                params, cfg, rope, jnp.asarray(tok), meta, cache_b,
                side_rows, side_valid, pool_lens, jnp.int32(k),
            )
            lg = np.asarray(lg)
            logits_b.append(lg)
            nxt = lg.argmax(-1).astype(np.int32)
            tok = np.where(valid, nxt, tok)
            pos = np.where(valid, pos + 1, pos)
            ctx = np.where(valid, ctx + 1, ctx)
        cache_b = L.flush_window_rows(
            cfg, cache_b, side_rows, side_valid, entry_pos,
            jnp.asarray(page_tables),
        )
    finally:
        del os.environ["ZT_PALLAS_INTERPRET"]

    # logits parity at every step for slots that were active then
    for k in range(KW):
        act = np.asarray(ctx0) + k + 1 <= limits
        np.testing.assert_allclose(
            logits_b[k][act], logits_a[k][act], rtol=2e-4, atol=2e-4,
            err_msg=f"step {k}",
        )

    # pool parity after the flush: every slot row written by the baseline
    ka = np.asarray(cache_a.k[0])
    kb = np.asarray(cache_b.k[0])
    for b in range(B):
        n = int(min(limits[b], ctx0[b] + KW) - ctx0[b])
        for j in range(n):
            p = int(ctx0[b]) + j
            slot = page_tables[b][p // S] * S + p % S
            np.testing.assert_allclose(
                kb[:, slot, :], ka[:, slot, :], rtol=2e-4, atol=2e-4,
                err_msg=f"slot {b} row {j}",
            )


def test_engine_window_e2e_interpret():
    """Engine decode windows with side-buffer writes (interpret kernels on
    CPU) produce the same greedy tokens as the default CPU engine."""
    import os

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.engine import GeneratorArg
    from zhilight_tpu.llm import LLM

    cfg = ModelConfig(
        model_type="llama", num_layers=2, dim_model=HKV * G * D,
        num_heads=HKV * G, dim_head=D, num_kv_heads=HKV, dim_ff=128,
        vocab_size=128, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=16, num_pages=16),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=16, prefill_buckets=(16,), eos_id=1,
            decode_multi_step=4,
        ),
    )
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(2, 100, size=n)) for n in (13, 5)]

    def run(env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            llm = LLM(model_config=cfg, params=jax.tree.map(lambda x: x, params),
                      engine_config=ecfg)
            with llm.generator() as g:
                return [
                    g.generate(p, GeneratorArg(max_length=10)).outputs[0].token_ids
                    for p in prompts
                ]
        finally:
            for k, v in old.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v

    base = run({})
    side = run({"ZT_PALLAS_INTERPRET": "1"})
    assert base == side, f"{base} vs {side}"


def test_engine_window_e2e_int8_interpret():
    """Same engine e2e equality with the int8 packed KV cache: window rows
    carry quantize-dequantized values and the flush requantizes + scatters
    per-(token, head) scales."""
    import os

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.engine import GeneratorArg
    from zhilight_tpu.llm import LLM

    cfg = ModelConfig(
        model_type="llama", num_layers=2, dim_model=HKV * G * D,
        num_heads=HKV * G, dim_head=D, num_kv_heads=HKV, dim_ff=128,
        vocab_size=128, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=16, num_pages=16, kv_dtype="int8"),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=16, prefill_buckets=(16,), eos_id=1,
            decode_multi_step=4,
        ),
    )
    rng = np.random.RandomState(4)
    prompts = [list(rng.randint(2, 100, size=n)) for n in (11, 7)]

    def run(env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            llm = LLM(model_config=cfg, params=jax.tree.map(lambda x: x, params),
                      engine_config=ecfg)
            with llm.generator() as g:
                return [
                    g.generate(p, GeneratorArg(max_length=8)).outputs[0].token_ids
                    for p in prompts
                ]
        finally:
            for k, v in old.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v

    base = run({})
    side = run({"ZT_PALLAS_INTERPRET": "1"})
    assert base == side, f"{base} vs {side}"


def test_engine_window_e2e_mla_interpret():
    """MLA latent cache through the window path (side latent rows + 2-D
    flush) matches the default CPU engine."""
    import os

    from zhilight_tpu.config import (
        CacheConfig, EngineConfig, MLAConfig, SchedulerConfig,
    )
    from zhilight_tpu.engine import GeneratorArg
    from zhilight_tpu.llm import LLM

    cfg = ModelConfig(
        model_type="deepseek_v2", num_layers=2, dim_model=32, num_heads=4,
        dim_head=8, num_kv_heads=4, dim_ff=64, vocab_size=128,
        dtype="float32",
        mla=MLAConfig(
            q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8,
            qk_rope_head_dim=4, v_head_dim=8,
        ),
    )
    params = L.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=16, num_pages=16),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=16, prefill_buckets=(16,), eos_id=1,
            decode_multi_step=4,
        ),
    )
    rng = np.random.RandomState(6)
    prompts = [list(rng.randint(2, 100, size=n)) for n in (12, 6)]

    def run(env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            llm = LLM(model_config=cfg, params=jax.tree.map(lambda x: x, params),
                      engine_config=ecfg)
            with llm.generator() as g:
                return [
                    g.generate(p, GeneratorArg(max_length=8)).outputs[0].token_ids
                    for p in prompts
                ]
        finally:
            for k, v in old.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v

    base = run({})
    side = run({"ZT_PALLAS_INTERPRET": "1"})
    assert base == side, f"{base} vs {side}"


def test_engine_window_e2e_moe_interpret():
    """MoE (qwen2-moe style shared+routed experts) through the window path
    matches the default CPU engine — the side buffer only touches attention,
    but this pins the full decoder-layer integration for MoE blocks."""
    import os

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.engine import GeneratorArg
    from zhilight_tpu.llm import LLM

    cfg = ModelConfig(
        model_type="qwen2_moe", num_layers=2, dim_model=HKV * G * D,
        num_heads=HKV * G, dim_head=D, num_kv_heads=HKV, dim_ff=128,
        vocab_size=128, dtype="float32",
        moe=MoEConfig(
            num_experts=4, top_k=2, intermediate_size=64,
            shared_expert_intermediate_size=64, shared_expert_gate=True,
            norm_topk_prob=True,
        ),
    )
    params = L.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=16, num_pages=16),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=16, prefill_buckets=(16,), eos_id=1,
            decode_multi_step=4,
        ),
    )
    rng = np.random.RandomState(8)
    prompts = [list(rng.randint(2, 100, size=n)) for n in (10, 6)]

    def run(env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            llm = LLM(model_config=cfg, params=jax.tree.map(lambda x: x, params),
                      engine_config=ecfg)
            with llm.generator() as g:
                return [
                    g.generate(p, GeneratorArg(max_length=8)).outputs[0].token_ids
                    for p in prompts
                ]
        finally:
            for k, v in old.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v

    base = run({})
    side = run({"ZT_PALLAS_INTERPRET": "1"})
    assert base == side, f"{base} vs {side}"
