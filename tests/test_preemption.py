"""Preemption / host-swap under optimistic admission (reference SwapBuf,
src/generator/batch_generator.cpp:329-358).

With ``admission_reserve < 1`` the scheduler admits more tasks than the
worst-case KV budget allows; when the bet loses, the newest decode task's
pages are reclaimed (swapped to host or dropped for recompute) and the task
resumes later — outputs must stay bit-identical to an unpressured run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta, PrefillMeta

VOCAB = 64
EOS = 1


@pytest.fixture(scope="module")
def tiny_model():
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
    return cfg, params


def naive_greedy_no_eos(cfg, params, prompt, max_new):
    """Greedy decode ignoring EOS (pressure tests need full-length runs)."""
    PAGE, MAXP, BUCKET = 4, 32, 32
    from zhilight_tpu.kvcache import new_kv_cache

    rope = L.build_rope(cfg)
    cache = new_kv_cache(cfg.num_layers, MAXP, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    n = len(prompt)
    tok = np.zeros(BUCKET, np.int32)
    tok[:n] = prompt
    pos = np.zeros(BUCKET, np.int32)
    pos[:n] = np.arange(n)
    slots = np.full(BUCKET, -1, np.int32)
    slots[:n] = np.arange(n)
    pt = np.full(MAXP, -1, np.int32)
    pt[: (n + PAGE - 1) // PAGE] = np.arange((n + PAGE - 1) // PAGE)
    meta = PrefillMeta(
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(pt),
        cache_len=jnp.int32(0),
        q_len=jnp.int32(n),
    )
    logits, cache = L.forward_prefill(params, cfg, rope, jnp.asarray(tok), meta, cache)
    out = [int(np.argmax(np.asarray(logits)))]
    while len(out) < max_new:
        p = n + len(out) - 1
        used = p // PAGE + 1
        ptb = np.full((1, MAXP), -1, np.int32)
        ptb[0, :used] = np.arange(used)
        dmeta = DecodeMeta(
            positions=jnp.asarray([p], jnp.int32),
            slot_mapping=jnp.asarray([p], jnp.int32),
            page_tables=jnp.asarray(ptb),
            context_lens=jnp.asarray([p + 1], jnp.int32),
        )
        dl, cache = L.forward_decode(
            params, cfg, rope, jnp.asarray([out[-1]], jnp.int32), dmeta, cache
        )
        out.append(int(np.argmax(np.asarray(dl[0]))))
    return out


def pressure_llm(tiny_model, mode, **kw):
    cfg, params = tiny_model
    defaults = dict(
        max_batch=4,
        chunk_size=8,
        prefill_buckets=(8, 16, 32),
        eos_id=EOS,
        ignore_eos=True,
        admission_reserve=0.2,
        preempt_mode=mode,
        session_ttl=0.0,
    )
    defaults.update(kw)
    # 8 pages x 4 = 32 KV tokens: two (7-prompt, 20-token) tasks need 54
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=8),
        scheduler=SchedulerConfig(**defaults),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg)


@pytest.mark.parametrize("mode", ["swap", "recompute"])
def test_preemption_exact_outputs(tiny_model, mode):
    """Two over-admitted tasks whose combined worst case exceeds the pool:
    the newest must get preempted and both must still produce exactly the
    unpressured greedy outputs."""
    cfg, params = tiny_model
    rng = np.random.RandomState(21)
    p1 = list(rng.randint(2, VOCAB, size=7))
    p2 = list(rng.randint(2, VOCAB, size=7))
    e1 = naive_greedy_no_eos(cfg, params, p1, 20)
    e2 = naive_greedy_no_eos(cfg, params, p2, 20)

    llm = pressure_llm(tiny_model, mode)
    with DynamicBatchGenerator(llm) as gen:
        rs = gen.batch_generate([p1, p2], GeneratorArg(max_length=20))
        n_pre = gen.scheduler.num_preemptions
    assert rs[0].outputs[0].token_ids == e1
    assert rs[1].outputs[0].token_ids == e2
    assert n_pre >= 1, "pool pressure never triggered a preemption"


@pytest.mark.parametrize("mode", ["swap", "recompute"])
def test_preemption_multi_step_windows(tiny_model, mode):
    """Same pressure with pipelined multi-step decode windows (the in-flight
    window / deferred-release machinery must stay consistent across
    preempt+resume)."""
    cfg, params = tiny_model
    rng = np.random.RandomState(22)
    p1 = list(rng.randint(2, VOCAB, size=6))
    p2 = list(rng.randint(2, VOCAB, size=9))
    e1 = naive_greedy_no_eos(cfg, params, p1, 18)
    e2 = naive_greedy_no_eos(cfg, params, p2, 18)

    llm = pressure_llm(tiny_model, mode, decode_multi_step=4)
    with DynamicBatchGenerator(llm) as gen:
        rs = gen.batch_generate([p1, p2], GeneratorArg(max_length=18))
        n_pre = gen.scheduler.num_preemptions
    assert rs[0].outputs[0].token_ids == e1
    assert rs[1].outputs[0].token_ids == e2
    assert n_pre >= 1


def test_conservative_admission_never_preempts(tiny_model):
    """Default admission_reserve=1.0 reserves the worst case: no preemption
    can occur regardless of pressure."""
    cfg, params = tiny_model
    rng = np.random.RandomState(23)
    prompts = [list(rng.randint(2, VOCAB, size=5)) for _ in range(4)]
    llm = pressure_llm(tiny_model, "swap", admission_reserve=1.0)
    with DynamicBatchGenerator(llm) as gen:
        gen.batch_generate(prompts, GeneratorArg(max_length=16))
        assert gen.scheduler.num_preemptions == 0


@pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
def test_swap_rows_roundtrip_packed(kv_dtype):
    """Executor row swap-out/in on the PACKED head-major pool (and its
    slot-major int8 scale leaves): layout mapping must be exact against
    direct numpy indexing."""
    cfg = ModelConfig(
        model_type="llama",
        num_layers=2,
        dim_model=128,
        num_heads=2,
        dim_head=64,  # 2*64 % 128 == 0 -> packed pool
        num_kv_heads=2,
        dim_ff=128,
        vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=8, kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=8, prefill_buckets=(8, 16), eos_id=EOS
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    ex = llm.executor
    assert ex.cache.packed

    # populate pages 0-1 through a real generation
    with DynamicBatchGenerator(llm) as gen:
        gen.generate(list(range(2, 9)), GeneratorArg(max_length=2))

    rows_a = np.arange(0, 8, dtype=np.int32)      # pages 0-1
    rows_b = np.arange(16, 24, dtype=np.int32)    # pages 4-5
    data = ex.swap_out_rows(rows_a)
    # expected rows straight off the device arrays
    k0 = np.asarray(ex.cache.k[0])
    expect_k0 = k0[:, rows_a]                     # packed: [H, m, 2D]
    got_k0 = np.asarray(data.k[0])[:, : len(rows_a)]
    np.testing.assert_array_equal(got_k0, expect_k0)
    if kv_dtype == "int8":
        s0 = np.asarray(ex.cache.k_scale[0])
        np.testing.assert_array_equal(
            np.asarray(data.k_scale[0])[: len(rows_a)], s0[rows_a]
        )

    ex.swap_in_rows(rows_b, data)
    k0b = np.asarray(ex.cache.k[0])
    np.testing.assert_array_equal(k0b[:, rows_b], expect_k0)
    # untouched rows unchanged
    np.testing.assert_array_equal(k0b[:, rows_a], k0[:, rows_a])
    if kv_dtype == "int8":
        s0b = np.asarray(ex.cache.k_scale[0])
        np.testing.assert_array_equal(s0b[rows_b], s0[rows_a])


def test_copy_slots_packed_int8_scales():
    """Regression: copy_slots on a packed int8 cache must move the slot-major
    [N, H] scale rows on dim 0 (the pool itself is head-major, dim 1)."""
    cfg = ModelConfig(
        model_type="llama",
        num_layers=1,
        dim_model=128,
        num_heads=2,
        dim_head=64,
        num_kv_heads=2,
        dim_ff=128,
        vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(6), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=8, kv_dtype="int8"),
        scheduler=SchedulerConfig(
            max_batch=2, chunk_size=8, prefill_buckets=(8, 16), eos_id=EOS
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    ex = llm.executor
    with DynamicBatchGenerator(llm) as gen:
        gen.generate(list(range(2, 9)), GeneratorArg(max_length=2))
    before_scale = np.asarray(ex.cache.k_scale[0])
    before_pool = np.asarray(ex.cache.k[0])
    src = np.arange(0, 4, dtype=np.int32)
    dst = np.arange(20, 24, dtype=np.int32)
    ex.copy_slots(src, dst)
    after_scale = np.asarray(ex.cache.k_scale[0])
    after_pool = np.asarray(ex.cache.k[0])
    np.testing.assert_array_equal(after_scale[dst], before_scale[src])
    np.testing.assert_array_equal(after_pool[:, dst], before_pool[:, src])
