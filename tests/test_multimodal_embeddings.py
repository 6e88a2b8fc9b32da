"""input_embeddings injection (reference SearchTask.input_embeddings path for
DeepSeek-VL2, zhilight/models/deepseek_vl_v2.py:63-136): feeding the model's
own token-embedding rows must reproduce the token-input generation exactly,
including through chunked prefill."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB = 64
EOS = 1


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        model_type="llama", num_layers=2, dim_model=32, num_heads=4, dim_head=8,
        num_kv_heads=2, dim_ff=64, vocab_size=VOCAB, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(max_batch=4, chunk_size=8, prefill_buckets=(8, 16, 32), eos_id=EOS),
    )
    return cfg, params, LLM(model_config=cfg, params=params, engine_config=ecfg)


def test_embeddings_match_tokens(setup):
    cfg, params, llm = setup
    rng = np.random.RandomState(9)
    prompt = list(rng.randint(2, VOCAB, size=11))  # > chunk_size: chunked path
    emb_table = np.asarray(params["embedding"]["w"], np.float32)
    emb = emb_table[np.asarray(prompt)] * cfg.scale_emb

    with DynamicBatchGenerator(llm) as gen:
        want = gen.generate(prompt, GeneratorArg(max_length=6)).outputs[0].token_ids
        got = gen.generate(
            prompt, GeneratorArg(max_length=6), input_embeddings=emb
        ).outputs[0].token_ids
    assert got == want


def test_embeddings_skip_prefix_cache(setup):
    """ADVICE r1 (medium): prompts with input_embeddings must neither register
    nor match the token-keyed prefix cache — identical placeholder token ids
    can carry different images."""
    cfg, params, _ = setup
    ecfg = EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64, enable_prefix_caching=True),
        scheduler=SchedulerConfig(max_batch=4, chunk_size=32, prefill_buckets=(8, 16, 32), eos_id=EOS),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
    rng = np.random.RandomState(13)
    prompt = list(rng.randint(2, VOCAB, size=8))
    emb_table = np.asarray(params["embedding"]["w"], np.float32)
    emb_a = emb_table[np.asarray(prompt)] * cfg.scale_emb
    emb_b = emb_a + 0.25  # "different image", same placeholder token ids

    from zhilight_tpu.engine.task import SearchTask
    from zhilight_tpu.engine import GeneratorArg as GA

    with DynamicBatchGenerator(llm) as gen:
        # a text request registers its prefix
        gen.generate(prompt, GeneratorArg(max_length=3))
        assert gen.scheduler.allocator.num_cached > 0
        cached0 = gen.scheduler.allocator.num_cached

        ta = SearchTask(prompt, GA(max_length=3), input_embeddings=emb_a)
        gen.scheduler.submit(ta)
        _, out_a = ta.res_queue.get(timeout=120)
        tb = SearchTask(prompt, GA(max_length=3), input_embeddings=emb_b)
        gen.scheduler.submit(tb)
        _, out_b = tb.res_queue.get(timeout=120)

    # neither matched the text prefix nor registered new entries
    assert ta.prefix_hit_len == 0 and tb.prefix_hit_len == 0
    assert gen.scheduler.allocator.num_cached == cached0
    # different embeddings over the same token ids produce different KV
    assert out_a.token_ids != out_b.token_ids


def test_custom_position_ids(setup):
    cfg, params, llm = setup
    rng = np.random.RandomState(10)
    prompt = list(rng.randint(2, VOCAB, size=6))
    with DynamicBatchGenerator(llm) as gen:
        base = gen.generate(prompt, GeneratorArg(max_length=4)).outputs[0].token_ids
        same = gen.generate(
            prompt, GeneratorArg(max_length=4),
            position_ids=np.arange(len(prompt), dtype=np.int32),
        ).outputs[0].token_ids
    assert same == base


def test_strip_language_replaces_torch_lm(setup):
    """ADVICE r1 (low): the VL2 wrapper must not keep the torch language
    weights in host RAM — after stripping, the language module is a shim that
    serves embeddings from the TPU-resident table (reference nulls
    `vl_gpt.language`, deepseek_vl_v2.py:90)."""
    torch = pytest.importorskip("torch")
    from zhilight_tpu.models.multimodal import DeepseekVL2

    cfg, params, llm = setup

    class FakeVL(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vision = torch.nn.Linear(8, 8)
            self.language = torch.nn.Sequential(
                torch.nn.Embedding(VOCAB, 512), torch.nn.Linear(512, 512)
            )

    vl = DeepseekVL2(llm, model_path="/nonexistent")
    fake = FakeVL()
    n_before = sum(p.numel() for p in fake.parameters())
    vl._strip_language(fake)
    n_after = sum(p.numel() for p in fake.parameters())
    assert n_after < n_before // 10  # language weights actually gone
    ids = torch.tensor([[2, 3, 5]])
    out = fake.language.get_input_embeddings()(ids)
    expect = np.asarray(params["embedding"]["w"], np.float32)[[2, 3, 5]]
    np.testing.assert_allclose(out.numpy()[0], expect, rtol=1e-6)
