"""Scoring utilities (calc_logits / calc_log_prob / calc_loss /
calc_greedy_match) vs direct forward math — reference LLaMA::calc_* APIs
(src/model/llama.h:100-131, tests/test_log_prob.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB = 64


@pytest.fixture(scope="module")
def llm():
    cfg = ModelConfig(
        model_type="llama",
        num_layers=2,
        dim_model=32,
        num_heads=4,
        dim_head=8,
        num_kv_heads=2,
        dim_ff=64,
        vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=128,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(max_batch=2, prefill_buckets=(16, 32, 128)),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg)


def test_calc_logits_shape_and_softmax(llm):
    toks = [5, 9, 12, 33, 17]
    logits = llm.calc_logits(toks)
    assert logits.shape == (5, VOCAB)
    # next-token logprob consistency with calc_log_prob
    total, per = llm.calc_log_prob(toks)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    want = [float(lp[i, toks[i + 1]]) for i in range(4)]
    np.testing.assert_allclose(per, want, rtol=1e-4, atol=1e-5)
    assert abs(total - sum(want)) < 1e-3


def test_calc_loss_and_greedy_match(llm):
    toks = [5, 9, 12, 33, 17, 40, 2]
    loss = llm.calc_loss(toks)
    total, per = llm.calc_log_prob(toks)
    assert abs(loss + total / len(per)) < 1e-5
    assert loss > 0

    m = llm.calc_greedy_match(toks)
    logits = llm.calc_logits(toks)
    want = int(np.sum(np.argmax(logits[:-1], -1) == np.asarray(toks[1:])))
    assert m == want


def test_calc_log_prob_explicit_labels(llm):
    toks = [5, 9, 12, 33]
    labels = [9, 12, 33, 17]
    total, per = llm.calc_log_prob(toks, labels)
    assert len(per) == 4
    # labels[i] scored under logits at position i
    logits = llm.calc_logits(toks)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = [float(lp[i, labels[i]]) for i in range(4)]
    np.testing.assert_allclose(per, want, rtol=1e-4, atol=1e-5)


def test_score_longer_than_largest_bucket(llm):
    """Scoring sequences beyond the largest prefill bucket compiles a
    dedicated shape instead of crashing (regression, same class as the
    record_prompt overflow)."""
    import numpy as np

    cap = llm.executor.sched_cfg.prefill_buckets[-1]
    rng = np.random.RandomState(7)
    toks = list(rng.randint(2, 60, size=cap + 5))
    total, per = llm.calc_log_prob(toks)
    assert np.isfinite(total) and len(per) == len(toks) - 1


def test_hidden_states_surface(llm):
    """calc_hidden_states + GeneratorArg.output_hidden_states (reference
    output_hidden_states / RequestResult.hidden_states,
    batch_generator.cpp:734-752)."""
    import numpy as np

    from zhilight_tpu.engine import GeneratorArg

    toks = [5, 9, 17, 23]
    hs = llm.calc_hidden_states(toks)
    assert hs.shape == (4, llm.model_config.dim_model)
    assert np.isfinite(hs).all()

    with llm.generator() as g:
        res = g.generate(
            toks, GeneratorArg(max_length=4, output_hidden_states=True)
        )
    assert res.hidden_states is not None and len(res.hidden_states) == 1
    full = res.hidden_states[0]
    n_out = len(res.outputs[0].token_ids)
    assert full.shape == (len(toks) + n_out, llm.model_config.dim_model)
    # prompt prefix matches the standalone scoring pass
    np.testing.assert_allclose(full[: len(toks)], hs, rtol=1e-5, atol=1e-5)
