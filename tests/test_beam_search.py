"""Beam search vs a naive full-recompute reference on CPU.

The reference mirrors the engine's beam bookkeeping (BeamGroup.plan_update —
itself a port of the C++ pick_top_k flow) but recomputes logits from scratch
each step, so it validates the engine's paged-KV sharing/cloning across beam
reorders.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.engine.beam import BeamGroup, BeamHypo, BeamResultManager
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import PrefillMeta

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


def _last_logprobs(cfg, params, tokens):
    """Full-recompute logits of the last position (identity page table)."""
    PAGE, MAXP = 4, 32
    rope = L.build_rope(cfg)
    cache = new_kv_cache(cfg.num_layers, MAXP, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    n = len(tokens)
    BUCKET = 128
    tok = np.zeros(BUCKET, np.int32)
    tok[:n] = tokens
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
    logits, _ = L.forward_prefill(params, cfg, rope, jnp.asarray(tok), meta, cache)
    lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))
    return lp


class _FakeTask:
    def __init__(self, arg):
        self.arg = arg


def naive_beam(cfg, params, prompt, arg, eos=EOS, keep_eos=False):
    """Reference beam search: same bookkeeping, full recompute scoring."""
    group = BeamGroup(_FakeTask(arg), slots=list(range(arg.beam_size)))
    group.beams = [BeamHypo(slot=0, output_tokens=[], cum_logprob=0.0)]
    num_top = min(2 * arg.beam_size, 32)

    while True:
        cands = []
        for i, h in enumerate(group.beams):
            lp = _last_logprobs(cfg, params, list(prompt) + h.output_tokens)
            top = np.argsort(-lp)[:num_top]
            for t in top:
                cands.append((h.cum_logprob + lp[t], i, int(t), float(lp[t])))
        cands.sort(key=lambda c: -c[0])
        cands = [(i, t, l) for _, i, t, l in cands[:num_top]]
        next_beams = group.plan_update(cands, eos, keep_eos, arg.max_length)
        if not next_beams or group.should_stop(next_beams):
            break
        group.beams = [
            BeamHypo(
                slot=0,
                output_tokens=group.beams[p].output_tokens + [t],
                cum_logprob=c,
            )
            for p, t, c in next_beams
        ]
    for h in sorted(group.beams, key=lambda h: -h.cum_logprob):
        if group.results.full:
            break
        group.results.add(
            list(h.output_tokens), h.cum_logprob, h.cum_logprob / max(len(h.output_tokens), 1)
        )
    return group.results.best()


def make_llm(tiny_model, **sched_kw):
    from zhilight_tpu.llm import LLM

    cfg, params = tiny_model
    defaults = dict(
        max_batch=8,
        max_total_token=2048,
        chunk_size=32,
        prefill_buckets=(8, 16, 32, 128),
        eos_id=EOS,
    )
    defaults.update(sched_kw)
    ecfg = EngineConfig(
        max_model_len=128,
        cache=CacheConfig(page_size=4, num_pages=256),
        scheduler=SchedulerConfig(**defaults),
        parallel=None or __import__("zhilight_tpu.config", fromlist=["ParallelConfig"]).ParallelConfig(),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg)


@pytest.mark.parametrize("beam,num_results,max_new", [(2, 1, 6), (3, 2, 8)])
def test_beam_matches_naive(tiny_model, beam, num_results, max_new):
    cfg, params = tiny_model
    rng = np.random.RandomState(4)
    prompt = list(rng.randint(2, VOCAB, size=7))
    arg = GeneratorArg(beam_size=beam, num_results=num_results, max_length=max_new)

    expected = naive_beam(cfg, params, prompt, arg)

    llm = make_llm(tiny_model)
    with DynamicBatchGenerator(llm) as gen:
        res = gen.generate(prompt, arg)
    got = [(o.token_ids, o.score) for o in res.outputs]

    assert len(got) == min(num_results, len(expected))
    for (gt, gs), (es, ec, et, _) in zip(got, expected):
        assert gt == et, f"tokens mismatch: {gt} vs {et}"
        assert abs(gs - es) < 1e-3  # normalized score


def test_beam_with_concurrent_greedy(tiny_model):
    """Beam group coexists with ordinary greedy tasks in the same batch."""
    cfg, params = tiny_model
    rng = np.random.RandomState(5)
    p_beam = list(rng.randint(2, VOCAB, size=5))
    p_greedy = list(rng.randint(2, VOCAB, size=9))

    arg_b = GeneratorArg(beam_size=2, max_length=5)
    arg_g = GeneratorArg(max_length=5)

    expected_beam = naive_beam(cfg, params, p_beam, arg_b)

    llm = make_llm(tiny_model)
    with DynamicBatchGenerator(llm) as gen:
        # interleave submissions
        import threading

        results = {}

        def run(name, p, a):
            results[name] = gen.generate(p, a)

        t1 = threading.Thread(target=run, args=("beam", p_beam, arg_b))
        t2 = threading.Thread(target=run, args=("greedy", p_greedy, arg_g))
        t1.start(); t2.start(); t1.join(); t2.join()

    assert results["beam"].outputs[0].token_ids == expected_beam[0][2]
    assert len(results["greedy"].outputs[0].token_ids) > 0


def test_beam_no_head_of_line_blocking(tiny_model):
    """A beam task that cannot get beam_size slots must NOT stall at the
    queue head: its primary prefills immediately in the one free slot (slot
    debt defers the hypothesis claim until running tasks finish), and the
    final beams still match the unpressured reference."""
    cfg, params = tiny_model
    rng = np.random.RandomState(6)
    p_long = list(rng.randint(2, VOCAB, size=6))
    p_beam = list(rng.randint(2, VOCAB, size=7))

    arg_b = GeneratorArg(beam_size=2, max_length=6)
    expected_beam = naive_beam(cfg, params, p_beam, arg_b)

    # 2 slots: one long-running greedy task occupies one; the beam task needs
    # both. Old behavior: beam waits at the head for 2 simultaneous free
    # slots (= the greedy task must fully finish before the beam prefills).
    llm = make_llm(tiny_model, max_batch=2)
    with DynamicBatchGenerator(llm) as gen:
        import threading

        results = {}

        def run(name, p, a):
            results[name] = gen.generate(p, a)

        t1 = threading.Thread(
            target=run, args=("long", p_long, GeneratorArg(max_length=40))
        )
        t1.start()
        import time as _t

        _t.sleep(0.3)  # let the long task occupy its slot
        t2 = threading.Thread(target=run, args=("beam", p_beam, arg_b))
        t2.start()
        t1.join(); t2.join()
        n_parks = gen.scheduler.num_beam_parks

    assert results["beam"].outputs[0].token_ids == expected_beam[0][2]
    assert len(results["long"].outputs[0].token_ids) == 40
    assert n_parks >= 1, "beam task never took the early-prefill park path"
