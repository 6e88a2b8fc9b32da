"""Multi-turn sessions: KV reuse across turns, rollback, close.

Parity: reference SessionGenerator (zhilight/session_generator.py) +
scheduler session retention. Correctness check: a session's multi-turn output
must equal a fresh full-prompt generation (the KV reuse must be lossless).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.engine.session import SessionGenerator
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB = 64
EOS = 1


@pytest.fixture(scope="module")
def llm():
    cfg = ModelConfig(
        model_type="llama", num_layers=2, dim_model=32, num_heads=4, dim_head=8,
        num_kv_heads=2, dim_ff=64, vocab_size=VOCAB, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=128,
        cache=CacheConfig(page_size=4, num_pages=128),
        scheduler=SchedulerConfig(max_batch=4, chunk_size=16, prefill_buckets=(16, 32, 128), eos_id=EOS),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg)


def test_session_matches_fresh_generation(llm):
    rng = np.random.RandomState(7)
    turn1 = list(rng.randint(2, VOCAB, size=9))
    turn2 = list(rng.randint(2, VOCAB, size=6))

    with DynamicBatchGenerator(llm) as gen:
        with SessionGenerator(gen) as sess:
            r1 = sess.generate(turn1, GeneratorArg(max_length=4))
            out1 = r1.outputs[0].token_ids
            r2 = sess.generate(turn2, GeneratorArg(max_length=4))
            out2 = r2.outputs[0].token_ids
        # fresh generation over the concatenated context must match
        fresh = gen.generate(turn1 + out1 + turn2, GeneratorArg(max_length=4))
    assert out2 == fresh.outputs[0].token_ids


def test_session_rollback(llm):
    rng = np.random.RandomState(8)
    base = list(rng.randint(2, VOCAB, size=8))
    spec = list(rng.randint(2, VOCAB, size=3))
    tail = list(rng.randint(2, VOCAB, size=4))

    with DynamicBatchGenerator(llm) as gen:
        with SessionGenerator(gen) as sess:
            sess.feed(base)
            sess.feed(spec)          # speculative tokens
            sess.rollback_speculative(len(spec) + 1)  # +1: feed's probe token isn't in history
            assert sess.context_len == len(base) - 1
            r = sess.generate(tail, GeneratorArg(max_length=4))
        fresh = gen.generate(base[:-1] + tail, GeneratorArg(max_length=4))
    assert r.outputs[0].token_ids == fresh.outputs[0].token_ids


def test_session_close_releases_pages(llm):
    with DynamicBatchGenerator(llm) as gen:
        free0 = gen.scheduler.allocator.num_free
        sess = SessionGenerator(gen)
        sess.generate([5, 9, 12, 33], GeneratorArg(max_length=3))
        assert gen.scheduler.allocator.num_free < free0
        sess.close()
        assert gen.scheduler.allocator.num_free == free0
