"""OpenAI server API tests over a tiny random model with a toy tokenizer."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("aiohttp")
import asyncio

from aiohttp.test_utils import TestClient, TestServer


def run_async(coro):
    return asyncio.new_event_loop().run_until_complete(coro)

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L
from zhilight_tpu.server.openai.api_server import build_app
from zhilight_tpu.server.openai.serving import AsyncEngine

VOCAB = 64
EOS = 1


class ToyTokenizer:
    """Char-level tokenizer: byte -> token id (mod vocab), decoding to chars."""

    eos_token_id = EOS

    def encode(self, text):
        return [2 + (ord(c) % (VOCAB - 2)) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (int(i) % 26)) for i in ids if int(i) >= 2)

    def apply_chat_template(self, messages, tokenize=True, add_generation_prompt=True, **kw):
        text = "".join(m["content"] or "" for m in messages)
        return self.encode(text)


@pytest.fixture(scope="module")
def served():
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
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=16, prefill_buckets=(16, 32), eos_id=EOS
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg, tokenizer=ToyTokenizer())
    gen = DynamicBatchGenerator(llm).start()
    engine = AsyncEngine(llm, gen)
    # aiohttp apps freeze once served: hand each test a fresh app
    yield lambda: build_app(engine, "tiny-llama", api_key=None)
    gen.stop()


async def _client(served):
    server = TestServer(served())
    client = TestClient(server)
    await client.start_server()
    return client


def test_health_models_version(served):
    run_async(_test_health_models_version(served))


async def _test_health_models_version(served):
    client = await _client(served)
    try:
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny-llama"
        r = await client.get("/version")
        assert (await r.json())["version"]
        r = await client.get("/metrics")
        assert r.status == 200
    finally:
        await client.close()


def test_chat_completion(served):
    run_async(_test_chat_completion(served))


async def _test_chat_completion(served):
    client = await _client(served)
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hello world"}],
                "max_tokens": 8,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"
        assert data["usage"]["completion_tokens"] > 0
    finally:
        await client.close()


def test_chat_completion_stream(served):
    run_async(_test_chat_completion_stream(served))


async def _test_chat_completion_stream(served):
    client = await _client(served)
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 6,
                "stream": True,
            },
        )
        assert r.status == 200
        body = await r.text()
        chunks = [l[len("data: "):] for l in body.splitlines() if l.startswith("data: ")]
        assert chunks[-1] == "[DONE]"
        parsed = [json.loads(c) for c in chunks[:-1]]
        assert parsed[0]["choices"][0]["delta"].get("role") == "assistant"
        assert parsed[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    finally:
        await client.close()


def test_completions(served):
    run_async(_test_completions(served))


async def _test_completions(served):
    client = await _client(served)
    try:
        r = await client.post(
            "/v1/completions", json={"prompt": "abc", "max_tokens": 5}
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "text_completion"
        assert isinstance(data["choices"][0]["text"], str)
    finally:
        await client.close()
