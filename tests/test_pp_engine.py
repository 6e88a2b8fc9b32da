"""Pipeline parallelism wired into the serving engine (VERDICT r1 #10).

A pp=4 engine on the 8-device CPU mesh must produce the same greedy tokens
as the plain single-device engine, end-to-end through DynamicBatchGenerator
(chunked prefill + decode + sessions of the real scheduler loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, ParallelConfig, SchedulerConfig,
)
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB, EOS = 64, 1


def _run_engine(cfg, params, prompts, pp):
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32), eos_id=EOS,
        ),
        parallel=ParallelConfig(pp=pp),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    if pp > 1:
        assert llm.executor.pp == pp and llm.executor.stacked
    gen = DynamicBatchGenerator(llm).start()
    rs = gen.batch_generate(prompts, GeneratorArg(max_length=8))
    out = [r.outputs[0].token_ids for r in rs]
    gen.stop()
    return out


def test_pp_engine_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = ModelConfig(
        model_type="llama", num_layers=4, dim_model=32, num_heads=4,
        dim_head=8, num_kv_heads=2, dim_ff=64, vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 11, 19)]

    base = _run_engine(cfg, params, prompts, pp=1)
    pp = _run_engine(cfg, params, prompts, pp=4)
    assert base == pp


def test_pp_scoring_and_hidden():
    """calc_logits / calc_hidden_states work under pp (PPForwards
    forward_score/forward_hidden) and match the single-device values."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = ModelConfig(
        model_type="llama", num_layers=4, dim_model=32, num_heads=4,
        dim_head=8, num_kv_heads=2, dim_ff=64, vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    toks = [3, 9, 21, 33, 47]

    def build(pp):
        ecfg = EngineConfig(
            max_model_len=64,
            cache=CacheConfig(page_size=4, num_pages=64),
            scheduler=SchedulerConfig(
                max_batch=4, chunk_size=8, prefill_buckets=(8,), eos_id=EOS,
            ),
            parallel=ParallelConfig(pp=pp),
        )
        return LLM(model_config=cfg, params=params, engine_config=ecfg)

    base = build(1)
    pped = build(2)
    np.testing.assert_allclose(
        pped.calc_logits(toks), base.calc_logits(toks), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        pped.calc_hidden_states(toks), base.calc_hidden_states(toks),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_x_tp_engine_matches_single_device():
    """PP composed with TP (VERDICT r3 #5; reference pp groups OF tp ranks,
    3rd/bmengine engine.cpp:94-106): a tp2 x pp2 engine on 4 CPU devices
    produces the same greedy tokens as the single-device engine, end-to-end
    through the real scheduler."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = ModelConfig(
        model_type="llama", num_layers=4, dim_model=32, num_heads=4,
        dim_head=8, num_kv_heads=2, dim_ff=64, vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(5)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 13)]

    base = _run_engine(cfg, params, prompts, pp=1)

    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32), eos_id=EOS,
        ),
        parallel=ParallelConfig(tp=2, pp=2),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    assert llm.executor.pp == 2 and llm.executor.stacked
    gen = DynamicBatchGenerator(llm).start()
    rs = gen.batch_generate(prompts, GeneratorArg(max_length=8))
    got = [r.outputs[0].token_ids for r in rs]
    gen.stop()
    assert base == got
