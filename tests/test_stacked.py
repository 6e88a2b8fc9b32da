"""Layer-stacked scan forward vs the per-layer Python loop (models/stacked.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models import stacked as SK
from zhilight_tpu.models.base import DecodeMeta, PrefillMeta

VOCAB = 64


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        model_type="llama", num_layers=3, dim_model=32, num_heads=4, dim_head=8,
        num_kv_heads=2, dim_ff=64, vocab_size=VOCAB, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_stacked_prefill_decode_parity(model):
    cfg, params = model
    assert SK.is_stackable(cfg)
    PAGE, MAXP = 4, 8
    rope = L.build_rope(cfg)
    rng = np.random.RandomState(0)
    prompt = list(rng.randint(2, VOCAB, size=9))
    n = len(prompt)
    BUCKET = 16

    # per-layer reference
    cache_ref = new_kv_cache(cfg.num_layers, MAXP, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    tok = np.zeros(BUCKET, np.int32); tok[:n] = prompt
    pos = np.zeros(BUCKET, np.int32); pos[:n] = np.arange(n)
    slots = np.full(BUCKET, -1, np.int32); slots[:n] = np.arange(n)
    pt = np.full(MAXP, -1, np.int32)
    used = (n + PAGE - 1) // PAGE
    pt[:used] = np.arange(used)
    meta = PrefillMeta(
        positions=jnp.asarray(pos), slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(pt), cache_len=jnp.int32(0), q_len=jnp.int32(n),
    )
    ref_logits, cache_ref = L.forward_prefill(params, cfg, rope, jnp.asarray(tok), meta, cache_ref)

    # stacked: single pool with L*MAXP pages, same per-layer-relative meta
    sp = SK.stack_params(cfg, params)
    cache_st = new_kv_cache(1, MAXP * cfg.num_layers, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    st_logits, cache_st = SK.forward_prefill(sp, cfg, rope, jnp.asarray(tok), meta, cache_st)

    np.testing.assert_allclose(np.asarray(st_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4)

    # decode step parity
    p0 = n
    dmeta = DecodeMeta(
        positions=jnp.asarray([p0], jnp.int32),
        slot_mapping=jnp.asarray([p0], jnp.int32),
        page_tables=jnp.asarray(pt)[None],
        context_lens=jnp.asarray([p0 + 1], jnp.int32),
    )
    tok1 = jnp.asarray([int(np.argmax(np.asarray(ref_logits)))], jnp.int32)
    ref_d, _ = L.forward_decode(params, cfg, rope, tok1, dmeta, cache_ref)
    st_d, _ = SK.forward_decode(sp, cfg, rope, tok1, dmeta, cache_st)
    np.testing.assert_allclose(np.asarray(st_d), np.asarray(ref_d), rtol=1e-4, atol=1e-4)


def test_engine_stacked_matches_loop(model):
    """Full engine run: stacked on (default) vs off must produce identical
    greedy tokens."""
    import os
    from zhilight_tpu.llm import LLM
    from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg

    cfg, params = model
    def run():
        ecfg = EngineConfig(
            max_model_len=64,
            cache=CacheConfig(page_size=4, num_pages=64),
            scheduler=SchedulerConfig(max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32), eos_id=1),
        )
        llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
        with DynamicBatchGenerator(llm) as gen:
            return gen.generate([5, 9, 12, 33, 17, 40, 8, 3, 22], GeneratorArg(max_length=6)).outputs[0].token_ids

    os.environ["ZT_STACK"] = "1"
    try:
        got = run()
    finally:
        del os.environ["ZT_STACK"]
    want = run()
    assert got == want
