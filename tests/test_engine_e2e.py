"""End-to-end continuous-batching engine test on CPU with a tiny random model.

Checks that the scheduler (admission, paged allocation, chunked prefill,
prefix cache, sampling, streaming) produces exactly the same greedy tokens as
a naive non-batched decode loop using the raw model functions.
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
    ParallelConfig,
)
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.engine.task import TaskStatus
from zhilight_tpu.kvcache import new_kv_cache
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


def naive_greedy(cfg, params, prompt, max_new):
    """Reference: identity-paged greedy decode with raw model fns."""
    PAGE, MAXP, BUCKET = 4, 16, 32
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
    while len(out) < max_new and out[-1] != EOS:
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
    if out and out[-1] == EOS:
        out = out[:-1]
    return out


def make_llm(tiny_model, **sched_kw):
    cfg, params = tiny_model
    defaults = dict(
        max_batch=4,
        max_total_token=512,
        chunk_size=8,
        prefill_buckets=(8, 16, 32),
        eos_id=EOS,
    )
    defaults.update(sched_kw)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(**defaults),
        parallel=ParallelConfig(tp=1, dp=1),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg)


def test_engine_matches_naive_greedy(tiny_model):
    cfg, params = tiny_model
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 11, 19)]
    max_new = 8

    expected = [naive_greedy(cfg, params, p, max_new) for p in prompts]

    llm = make_llm(tiny_model)
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(prompts, GeneratorArg(max_length=max_new))
    got = [r.outputs[0].token_ids for r in results]
    assert got == expected


def test_chunked_prefill_matches(tiny_model):
    """Prompt longer than chunk_size forces multiple chunks."""
    cfg, params = tiny_model
    rng = np.random.RandomState(1)
    prompt = list(rng.randint(2, VOCAB, size=21))
    expected = naive_greedy(cfg, params, prompt, 6)

    llm = make_llm(tiny_model, chunk_size=8)
    with DynamicBatchGenerator(llm) as gen:
        res = gen.generate(prompt, GeneratorArg(max_length=6))
    assert res.outputs[0].token_ids == expected


def test_prefix_cache_reuse(tiny_model):
    cfg, params = tiny_model
    rng = np.random.RandomState(2)
    shared = list(rng.randint(2, VOCAB, size=16))
    p1 = shared + list(rng.randint(2, VOCAB, size=4))
    p2 = shared + list(rng.randint(2, VOCAB, size=3))

    e1 = naive_greedy(cfg, params, p1, 5)
    e2 = naive_greedy(cfg, params, p2, 5)

    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64, enable_prefix_caching=True),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=32, prefill_buckets=(8, 16, 32), eos_id=EOS
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    with DynamicBatchGenerator(llm) as gen:
        r1 = gen.generate(p1, GeneratorArg(max_length=5))
        r2 = gen.generate(p2, GeneratorArg(max_length=5))
    assert r1.outputs[0].token_ids == e1
    assert r2.outputs[0].token_ids == e2
    # second request must have hit the shared prefix pages
    assert gen.scheduler.allocator.num_cached > 0  # pages were registered


def test_sampling_determinism(tiny_model):
    llm = make_llm(tiny_model)
    prompt = [5, 9, 12, 33]
    arg = GeneratorArg(max_length=8, temperature=0.8, top_p=0.9, top_k=20, seed=7)
    with DynamicBatchGenerator(llm) as gen:
        a = gen.generate(prompt, arg).outputs[0].token_ids
        b = gen.generate(prompt, arg).outputs[0].token_ids
    assert a == b
    assert len(a) > 0


def test_streaming(tiny_model):
    llm = make_llm(tiny_model)
    prompt = [5, 9, 12, 33, 17]
    chunks = []
    with DynamicBatchGenerator(llm) as gen:
        for ev in gen.stream_generate(prompt, GeneratorArg(max_length=6)):
            if not ev["finished"]:
                chunks.extend(ev["tokens"])
            else:
                final = ev["output"]
    assert chunks == final.token_ids


def test_multi_step_decode_matches(tiny_model):
    """decode_multi_step > 1 (K tokens per device program) must produce
    exactly the same greedy tokens, including EOS/max_length mid-window."""
    cfg, params = tiny_model
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 11, 19)]
    max_new = 7  # not a multiple of the window

    expected = [naive_greedy(cfg, params, p, max_new) for p in prompts]

    llm = make_llm(tiny_model, decode_multi_step=4)
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(prompts, GeneratorArg(max_length=max_new))
    got = [r.outputs[0].token_ids for r in results]
    assert got == expected


def test_multi_step_page_boundary(tiny_model):
    """Window crossing page boundaries (page_size=4) allocates ahead."""
    cfg, params = tiny_model
    prompt = [3, 4, 5]
    expected = naive_greedy(cfg, params, prompt, 10)
    llm = make_llm(tiny_model, decode_multi_step=8)
    with DynamicBatchGenerator(llm) as gen:
        res = gen.generate(prompt, GeneratorArg(max_length=10))
    assert res.outputs[0].token_ids == expected


@pytest.fixture(scope="module")
def tiny_mla_model():
    """DeepSeek-style MLA model: latent KV cache through the whole engine."""
    from zhilight_tpu.config import MLAConfig

    cfg = ModelConfig(
        model_type="deepseek_v2",
        num_layers=2,
        dim_model=32,
        num_heads=4,
        dim_head=8,
        num_kv_heads=4,
        dim_ff=64,
        vocab_size=VOCAB,
        dtype="float32",
        mla=MLAConfig(
            q_lora_rank=16,
            kv_lora_rank=16,
            qk_nope_head_dim=8,
            qk_rope_head_dim=4,
            v_head_dim=8,
        ),
    )
    params = L.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    return cfg, params


def naive_greedy_mla(cfg, params, prompt, max_new):
    from zhilight_tpu.kvcache import new_latent_cache

    PAGE, MAXP, BUCKET = 4, 16, 32
    rope = L.build_rope(cfg)
    cache = new_latent_cache(cfg.num_layers, MAXP, PAGE, cfg.mla.latent_dim, jnp.float32)
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
    while len(out) < max_new and out[-1] != EOS:
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
    if out and out[-1] == EOS:
        out = out[:-1]
    return out


def test_engine_mla_matches_naive_greedy(tiny_mla_model):
    """The full serving engine over an MLA (latent-cache) model."""
    cfg, params = tiny_mla_model
    rng = np.random.RandomState(4)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 13)]
    expected = [naive_greedy_mla(cfg, params, p, 6) for p in prompts]

    llm = make_llm((cfg, params))
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(prompts, GeneratorArg(max_length=6))
    got = [r.outputs[0].token_ids for r in results]
    assert got == expected


def test_no_wasted_speculative_windows(tiny_model):
    """ADVICE r1: speculative chaining must stop once the successor window
    would run past a slot's limit — those windows execute full forwards with
    every slot frozen. A lone greedy task needing 9 decode tokens with K=4
    must dispatch exactly ceil(9/4)=3 windows."""
    cfg, params = tiny_model
    llm = make_llm(tiny_model, decode_multi_step=4, ignore_eos=True)
    prompt = [5, 9, 12, 33, 17]
    with DynamicBatchGenerator(llm) as gen:
        sched = gen.scheduler
        dispatched = []
        orig = sched._dispatch_window

        def counting(w, reuse_carry):
            dispatched.append(w["K"])
            return orig(w, reuse_carry)

        sched._dispatch_window = counting
        out = gen.generate(prompt, GeneratorArg(max_length=10)).outputs[0]
    assert len(out.token_ids) == 10
    assert len(dispatched) == 3, dispatched


def test_late_joiner_carry_invalidation(tiny_model):
    """A task that finishes prefilling while another decodes must not chain
    from the stale device-resident decode carry (its row held token 0/ctx 0).

    Regression: the carry invalidation fired at _assign time and was consumed
    by decode windows that ran during the joiner's chunked prefill; geometry
    chosen so the joiner allocates NO page at its first decode window (page
    allocation separately invalidates the carry, masking the bug)."""
    cfg, params = tiny_model
    rng = np.random.RandomState(7)
    p1 = list(rng.randint(2, VOCAB, size=5))
    p2 = list(rng.randint(2, VOCAB, size=9))  # 2 chunks; fits page with room

    e1 = naive_greedy(cfg, params, p1, 8)
    e2 = naive_greedy(cfg, params, p2, 8)

    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=16, num_pages=16),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32), eos_id=EOS
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    with DynamicBatchGenerator(llm) as gen:
        rs = gen.batch_generate([p1, p2], GeneratorArg(max_length=8))
    assert rs[0].outputs[0].token_ids == e1
    assert rs[1].outputs[0].token_ids == e2


def test_pipelined_windows_staggered_finish(tiny_model):
    """Pipelined decode windows (speculative dispatch before fetching the
    previous window): tasks finishing at different times must still produce
    exact greedy outputs, and late arrivals must drain the in-flight window
    cleanly."""
    cfg, params = tiny_model
    rng = np.random.RandomState(9)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 9, 13, 17)]
    lengths = [3, 12, 6, 9]  # staggered finish, none a window multiple

    expected = [
        naive_greedy(cfg, params, p, m) for p, m in zip(prompts, lengths)
    ]

    llm = make_llm(tiny_model, decode_multi_step=4, max_batch=3)
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(
            prompts, [GeneratorArg(max_length=m) for m in lengths]
        )
    got = [r.outputs[0].token_ids for r in results]
    assert got == expected


def test_pipeline_drains_after_boundary_finish(tiny_model):
    """The LAST decoding task finishing exactly at a window boundary (no
    truncation, so the successor window was already dispatched) must still
    drain that in-flight window and release its slot/pages — a follow-up
    request on the same generator would otherwise hang on admission."""
    cfg, params = tiny_model
    rng = np.random.RandomState(13)
    p1 = list(rng.randint(2, VOCAB, size=5))
    # K=4: prefill emits 1 token, two full windows emit 8 more -> finishes
    # on the window boundary with a chained window in flight
    e1 = naive_greedy(cfg, params, p1, 9)
    p3 = list(rng.randint(2, VOCAB, size=7))
    e3 = naive_greedy(cfg, params, p3, 5)

    llm = make_llm(tiny_model, decode_multi_step=4, max_batch=1)
    with DynamicBatchGenerator(llm) as gen:
        r1 = gen.generate(p1, GeneratorArg(max_length=9), timeout=60)
        r3 = gen.generate(p3, GeneratorArg(max_length=5), timeout=60)
    assert r1.outputs[0].token_ids == e1
    assert r3.outputs[0].token_ids == e3


def test_warmup_then_generate(tiny_model):
    """Startup warmup (reference VERIFY_MAX_TOKEN self-test) compiles every
    serving-shape program and leaves no state behind: generation afterwards
    is bit-identical to an un-warmed engine."""
    cfg, params = tiny_model
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (5, 13)]
    expected = [naive_greedy(cfg, params, p, 8) for p in prompts]

    llm = make_llm(tiny_model)
    dt = llm.executor.warmup()
    assert dt > 0
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(prompts, GeneratorArg(max_length=8))
    assert [r.outputs[0].token_ids for r in results] == expected


def test_chunk_chains_used_and_decode_priority(tiny_model):
    """A long prompt on an idle engine prefills via chunk chains (counter
    increments) and produces the same greedy output as the unchained path;
    while a decode slot is active, new prefills keep the one-chunk cadence."""
    import threading
    import time

    llm = make_llm(tiny_model, max_batch=2, chunk_size=8, prefill_buckets=(8,))
    gen = llm.generator().start()
    try:
        sched = gen.scheduler
        rng = np.random.RandomState(0)
        prompt = rng.randint(5, VOCAB - 2, 42).tolist()  # 6 chunks -> chain
        r1 = gen.generate(prompt, GeneratorArg(max_length=4, temperature=0.0))
        assert sched.num_chunk_chains >= 1
        base = list(r1.outputs[0].token_ids)

        res = {}

        def long_decode():
            res["a"] = gen.generate(
                rng.randint(5, VOCAB - 2, 6).tolist(),
                GeneratorArg(max_length=40, temperature=0.0),
            )

        t = threading.Thread(target=long_decode)
        t.start()
        for _ in range(300):
            if any(
                x is not None and x.status == TaskStatus.DECODE
                for x in sched.slots
            ):
                break
            time.sleep(0.005)
        r2 = gen.generate(prompt, GeneratorArg(max_length=4, temperature=0.0))
        t.join()
        assert list(r2.outputs[0].token_ids) == base
    finally:
        gen.stop()
