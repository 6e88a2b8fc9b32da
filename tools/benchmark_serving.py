"""Serving load benchmark: QPS / TTFT / TPOT, the reference's headline
metrics (docs/benchmarks/README.md stepped-QPS method against the OpenAI
endpoint; BASELINE.md rows).

Two modes:
  * --url http://host:port   — drive a running OpenAI server over HTTP
    (streaming chat completions; TTFT = first SSE chunk).
  * in-process (default)     — build an LLM (random weights unless
    --model-path) and drive DynamicBatchGenerator.stream_generate directly.

Requests arrive by a Poisson process at --qps; prompts are random token ids
of --input-len; generation is greedy for determinism. Prints one JSON line
with qps_achieved, ttft/tpot/e2e mean+p95.

Example (MiniCPM-2B geometry on the chip):
  python tools/benchmark_serving.py --qps 2 --num-requests 32 \
      --input-len 512 --output-len 64
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import numpy as np


def pct(v, p):
    return float(np.percentile(np.asarray(v), p)) if v else 0.0


def run_inprocess(args):
    from zhilight_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
    from zhilight_tpu.llm import LLM
    from zhilight_tpu.models import llama as L

    import jax

    if args.model_path:
        max_len = args.max_model_len or (args.input_len + args.output_len + 128)
        ecfg = EngineConfig(
            model_path=args.model_path,
            max_model_len=max_len,
            cache=CacheConfig(page_size=16, kv_dtype=args.kv_dtype),
            scheduler=SchedulerConfig(
                max_batch=args.batch,
                chunk_size=args.chunk_size,
                prefill_buckets=tuple(
                    sorted({min(128, args.chunk_size), args.chunk_size})
                ),
            ),
        )
        llm = LLM(model_path=args.model_path, engine_config=ecfg)
        vocab = llm.model_config.vocab_size
    else:
        # MiniCPM-2B geometry (reference 1-GPU baseline row)
        cfg = ModelConfig(
            model_type="cpm_dragonfly", num_layers=args.layers, dim_model=2304,
            num_heads=36, dim_head=64, num_kv_heads=36, dim_ff=5760,
            vocab_size=122753, dtype="bfloat16", scale_emb=12.0, scale_depth=1.4,
            dim_model_base=256, tie_lm_head=True,
        )
        max_len = args.input_len + args.output_len + 64
        budget_pages = args.batch * ((max_len + 15) // 16)
        ecfg = EngineConfig(
            max_model_len=max_len,
            cache=CacheConfig(page_size=16, num_pages=budget_pages),
            scheduler=SchedulerConfig(
                max_batch=args.batch,
                chunk_size=512,
                prefill_buckets=(128, 512, 1024, 2048),
            ),
        )
        params = L.init_params(cfg, jax.random.PRNGKey(0))
        llm = LLM(model_config=cfg, params=params, engine_config=ecfg)
        vocab = cfg.vocab_size

    rng = np.random.RandomState(0)
    prompts = [
        list(rng.randint(10, min(vocab, 30000), size=args.input_len))
        for _ in range(args.num_requests)
    ]
    arg = GeneratorArg(max_length=args.output_len, temperature=1.0)

    lock = threading.Lock()

    def one(results, prompt):
        ttft = None
        n_tokens = 0
        t0 = time.perf_counter()
        for ev in gen.stream_generate(prompt, arg):
            now = time.perf_counter()
            if not ev["finished"]:
                if ttft is None and ev["tokens"]:
                    ttft = now - t0
                n_tokens += len(ev["tokens"])
            else:
                out = ev["output"]
                e2e = now - t0
                n = max(len(out.token_ids), 1)
                tpot = (e2e - (ttft or e2e)) / max(n - 1, 1)
                with lock:
                    results.append((ttft or e2e, tpot, e2e, n))

    with llm.generator() as g:
        global gen
        gen = g
        # warmup
        g.generate(prompts[0][: args.input_len], GeneratorArg(max_length=4))

        for qps in args.qps:
            results = []
            threads = []
            t_start = time.perf_counter()
            intervals = rng.exponential(1.0 / qps, size=args.num_requests)
            for i, p in enumerate(prompts):
                th = threading.Thread(target=one, args=(results, p))
                th.start()
                threads.append(th)
                if i + 1 < args.num_requests:
                    time.sleep(float(intervals[i]))
            for th in threads:
                th.join()
            wall = time.perf_counter() - t_start

            ttfts = [r[0] for r in results]
            tpots = [r[1] for r in results]
            e2es = [r[2] for r in results]
            toks = sum(r[3] for r in results)
            print(json.dumps({
                "requests": len(results),
                "qps_offered": qps,
                "qps_achieved": round(len(results) / wall, 3),
                "output_tokens_per_s": round(toks / wall, 1),
                "ttft_mean_ms": round(1e3 * float(np.mean(ttfts)), 2),
                "ttft_p95_ms": round(1e3 * pct(ttfts, 95), 2),
                "tpot_mean_ms": round(1e3 * float(np.mean(tpots)), 2),
                "tpot_p95_ms": round(1e3 * pct(tpots, 95), 2),
                "e2e_mean_ms": round(1e3 * float(np.mean(e2es)), 2),
                "e2e_p95_ms": round(1e3 * pct(e2es, 95), 2),
            }), flush=True)


def run_http(args):
    import asyncio

    import aiohttp

    async def one(session, url, prompt_ids, results):
        t0 = time.perf_counter()
        ttft = None
        n = 0
        # exact-length prompts as token ids (the reference method controls
        # prompt length exactly; text prompts retokenize unpredictably)
        body = {
            "prompt": prompt_ids,
            "max_tokens": args.output_len,
            "temperature": 0,
            "stream": True,
        }
        async with session.post(f"{url}/v1/completions", json=body) as resp:
            if resp.status != 200:
                print(f"request failed: {resp.status} {await resp.text()}",
                      file=sys.stderr, flush=True)
                return
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data:"):
                    continue
                payload = line[5:].strip()
                if payload == "[DONE]":
                    break
                if ttft is None:
                    ttft = time.perf_counter() - t0
                n += 1
        e2e = time.perf_counter() - t0
        # SSE chunks can carry multiple tokens (window-granular streaming):
        # charge inter-token time by requested output length, not chunk count
        n_tok = args.output_len
        tpot = (e2e - (ttft or e2e)) / max(n_tok - 1, 1)
        results.append((ttft or e2e, tpot, e2e, n_tok))

    async def main():
        rng = np.random.RandomState(0)
        # warmup: sequential unmeasured requests so every shape bucket /
        # batch-geometry program compiles before the first measured step
        # (the reference's dockerized client likewise ramps through warm
        # steps; an in-step compile of 20-60 s would dominate a 10-request
        # TTFT mean)
        if args.warmup:
            async with aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=1800)
            ) as session:
                for i in range(args.warmup):
                    ids = rng.randint(10, 30000, size=args.input_len).tolist()
                    sink = []
                    await one(session, args.url, ids, sink)
                # one concurrent pair exercises the mixed decode+prefill
                # program variants (packed prefill, in-flight window resize)
                pair = []
                await asyncio.gather(*[
                    one(session, args.url,
                        rng.randint(10, 30000, size=args.input_len).tolist(), pair)
                    for _ in range(2)
                ])
            print(f"warmup done ({args.warmup}+2 requests)", file=sys.stderr, flush=True)
        for qps in args.qps:
            results = []
            async with aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=1800)
            ) as session:
                tasks = []
                t_start = time.perf_counter()
                for i in range(args.num_requests):
                    ids = rng.randint(10, 30000, size=args.input_len).tolist()
                    tasks.append(asyncio.create_task(one(session, args.url, ids, results)))
                    if i + 1 < args.num_requests:
                        await asyncio.sleep(float(rng.exponential(1.0 / qps)))
                await asyncio.gather(*tasks)
                wall = time.perf_counter() - t_start
            ttfts = [r[0] for r in results]
            tpots = [r[1] for r in results]
            e2es = [r[2] for r in results]
            toks = sum(r[3] for r in results)
            print(json.dumps({
                "requests": len(results),
                "qps_offered": qps,
                "qps_achieved": round(len(results) / wall, 3),
                "output_tokens_per_s": round(toks / wall, 1),
                "ttft_mean_ms": round(1e3 * float(np.mean(ttfts)), 2),
                "ttft_p95_ms": round(1e3 * pct(ttfts, 95), 2),
                "tpot_mean_ms": round(1e3 * float(np.mean(tpots)), 2),
                "tpot_p95_ms": round(1e3 * pct(tpots, 95), 2),
                "e2e_mean_ms": round(1e3 * float(np.mean(e2es)), 2),
            }), flush=True)

    asyncio.run(main())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="", help="OpenAI server base url; empty = in-process")
    ap.add_argument("--model-path", default="")
    ap.add_argument(
        "--qps", type=lambda s: [float(x) for x in s.split(",")], default=[1.0],
        help="comma-separated QPS steps; in-process mode runs them all in one "
        "process (first step doubles as the compile-warm pass)",
    )
    ap.add_argument("--num-requests", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=2,
                    help="HTTP mode: unmeasured sequential warm requests "
                         "(+1 concurrent pair) before the first step")
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--max-model-len", type=int, default=0, help="0 = input+output+128")
    ap.add_argument("--chunk-size", type=int, default=512)
    ap.add_argument("--kv-dtype", default="bfloat16", choices=["bfloat16", "int8"])
    args = ap.parse_args()
    if args.url:
        run_http(args)
    else:
        run_inprocess(args)
