"""Window-granularity edge semantics (VERDICT r3 #9).

The decode window batches K device steps per host round trip; these tests pin
the semantics at that granularity:

  * mixed beam + plain batches: a beam task forces K=1 windows for the whole
    batch (host-side reorders every step). Plain tasks must still produce
    bit-identical greedy tokens. (Splitting the window per group was
    evaluated and rejected: each group's program still streams the full
    weights, so a split DOUBLES the weight traffic of a weight-bound decode —
    shared K=1 windows are device-optimal; the cost is host-RTT per token,
    ~2-3x TPOT on the tunnel, not the 8x a naive step-count argument
    suggests. See PROFILES/decode_prefill_r4.md.)
  * include_stop_str_in_output through the generator.
  * cancellation: tokens emitted after a cancel are bounded by the windows
    already in flight (reference abort semantics, batch_generator.cpp).
"""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.engine.task import SearchTask, StreamResultType
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB = 64
EOS = 1
K = 4


def _cfg():
    return ModelConfig(
        model_type="llama", num_layers=2, dim_model=32, num_heads=4,
        dim_head=8, num_kv_heads=2, dim_ff=64, vocab_size=VOCAB,
        dtype="float32",
    )


def _mk_llm(tokenizer=None, max_batch=4):
    cfg = _cfg()
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=96),
        scheduler=SchedulerConfig(
            max_batch=max_batch, chunk_size=16, prefill_buckets=(8, 16, 32),
            eos_id=EOS, decode_multi_step=K,
        ),
    )
    return LLM(model_config=cfg, params=params, engine_config=ecfg,
               tokenizer=tokenizer)


def test_mixed_beam_plain_greedy_parity():
    """Plain greedy output is bit-identical with a beam task active in the
    batch (the switch to K=1 windows and back must not change sampling)."""
    rng = np.random.RandomState(9)
    p_plain = [list(rng.randint(2, VOCAB, size=7)), list(rng.randint(2, VOCAB, size=11))]
    p_beam = list(rng.randint(2, VOCAB, size=5))
    arg = GeneratorArg(max_length=12, ignore_eos=True)

    llm = _mk_llm()
    with DynamicBatchGenerator(llm) as gen:
        alone = [gen.generate(p, arg).outputs[0].token_ids for p in p_plain]

    llm = _mk_llm()
    with DynamicBatchGenerator(llm) as gen:
        results = {}

        def run(name, p, a):
            results[name] = gen.generate(p, a)

        ts = [
            threading.Thread(target=run, args=(i, p, arg))
            for i, p in enumerate(p_plain)
        ] + [
            threading.Thread(
                target=run,
                args=("beam", p_beam, GeneratorArg(beam_size=2, max_length=12)),
            )
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()

    mixed = [results[i].outputs[0].token_ids for i in range(len(p_plain))]
    assert mixed == alone
    assert len(results["beam"].outputs[0].token_ids) > 0


class _StubTok:
    """Deterministic detokenizer: id -> ' t<id>'."""

    eos_token_id = EOS

    def decode(self, ids):
        return "".join(f" t{int(i)}" for i in ids)


def test_include_stop_str_in_output():
    rng = np.random.RandomState(3)
    prompt = list(rng.randint(2, VOCAB, size=6))
    llm = _mk_llm(tokenizer=_StubTok())
    with DynamicBatchGenerator(llm) as gen:
        base = gen.generate(prompt, GeneratorArg(max_length=10, ignore_eos=True))
        toks = base.outputs[0].token_ids
        assert len(toks) >= 3
        stop = f" t{toks[2]}"  # third generated token's text

        res_ex = gen.generate(
            prompt,
            GeneratorArg(max_length=10, ignore_eos=True, stop_strings=[stop]),
        )
        res_inc = gen.generate(
            prompt,
            GeneratorArg(
                max_length=10, ignore_eos=True, stop_strings=[stop],
                include_stop_str_in_output=True,
            ),
        )
    assert res_ex.outputs[0].finish_reason == "stop"
    assert not res_ex.outputs[0].text.endswith(stop)
    assert res_inc.outputs[0].finish_reason == "stop"
    assert res_inc.outputs[0].text.endswith(stop)
    assert res_inc.outputs[0].text == res_ex.outputs[0].text + stop


def test_cancel_latency_bounded_by_windows_in_flight():
    """After cancel() the task finishes as 'abort' and emits at most the
    windows already dispatched (2K tokens: the in-flight window plus one
    speculative successor) beyond the cancel point."""
    rng = np.random.RandomState(4)
    prompt = list(rng.randint(2, VOCAB, size=6))
    llm = _mk_llm()
    with DynamicBatchGenerator(llm) as gen:
        task = SearchTask(
            np.asarray(prompt, np.int32).tolist(),
            GeneratorArg(max_length=48, ignore_eos=True),
            stream=True,
        )
        gen.scheduler.submit(task)
        got = 0
        cancel_at = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            flag, payload = task.res_queue.get(timeout=30)
            if flag == StreamResultType.Incremental:
                got += len(payload)
                if cancel_at is None and got >= K:
                    cancel_at = got
                    task.cancel()
            elif flag == StreamResultType.Final:
                break
        assert cancel_at is not None, "never reached the cancel point"
        out = payload if not isinstance(payload, list) else payload[0]
        assert out.finish_reason == "abort"
        assert len(out.token_ids) <= cancel_at + 2 * K, (
            len(out.token_ids), cancel_at,
        )
