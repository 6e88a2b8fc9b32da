"""Chunk-size ablation for TTFT: prefill a 3712-token MiniCPM-2B prompt
through the production chunked-prefill path at several chunk sizes and
print ms per variant (VERDICT r3 ask #3: arbitrate 512 vs 1024 vs 2048).

Usage: python tools/probe_chunk_ttft.py [--chunks 512,1024,2048] [--prompt 3712]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="512,1024,2048")
    ap.add_argument("--prompt", type=int, default=3712)
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zhilight_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from zhilight_tpu.engine.engine import ModelExecutor
    from zhilight_tpu.models import llama as L
    from zhilight_tpu.models.base import PrefillMeta
    from zhilight_tpu.ops.sampling import SamplingParams

    cfg = ModelConfig(
        model_type="cpm_dragonfly", num_layers=args.layers, dim_model=2304,
        num_heads=36, dim_head=64, num_kv_heads=36, dim_ff=5760,
        vocab_size=122753, dtype="bfloat16", scale_emb=12.0, scale_depth=1.4,
        dim_model_base=256, tie_lm_head=True,
    )
    PROMPT = args.prompt
    PAGE = 16
    chunk_list = [int(c) for c in args.chunks.split(",")]
    params = L.init_params(cfg, jax.random.PRNGKey(0))

    results = {}
    for CHUNK in chunk_list:
        ecfg = EngineConfig(
            max_model_len=PROMPT + 16,
            cache=CacheConfig(page_size=PAGE, num_pages=(PROMPT + 16) // PAGE + 8),
            scheduler=SchedulerConfig(
                max_batch=4, chunk_size=CHUNK, prefill_buckets=(CHUNK,)
            ),
        )
        ex = ModelExecutor(cfg, params, ecfg)
        n_chunks = (PROMPT + CHUNK - 1) // CHUNK
        n_pages = (PROMPT + 1 + PAGE - 1) // PAGE
        pages = np.arange(n_pages, dtype=np.int32)
        prompt_tokens = np.random.RandomState(0).randint(2, 1000, PROMPT).astype(np.int32)
        sp1 = SamplingParams.greedy(4)

        pt_host = np.full(ex.max_pages_per_seq, -1, np.int32)
        pt_host[:n_pages] = pages
        pages_dev = jnp.asarray(pt_host)

        def prefill_once():
            for c in range(n_chunks):
                start = c * CHUNK
                chunk = min(CHUNK, PROMPT - start)
                bucket = ex.pick_bucket(chunk)
                toks = np.zeros(bucket, np.int32)
                toks[:chunk] = prompt_tokens[start : start + chunk]
                if c + 1 < n_chunks:
                    ex.run_chunk_fused(toks, pages_dev, start, chunk)
                else:
                    pos = np.zeros(bucket, np.int32)
                    pos[:chunk] = np.arange(start, start + chunk)
                    slots = np.full(bucket, -1, np.int32)
                    slots[:chunk] = np.arange(start, start + chunk)
                    meta = PrefillMeta(
                        positions=jnp.asarray(pos),
                        slot_mapping=jnp.asarray(slots),
                        page_table=pages_dev,
                        cache_len=jnp.int32(start),
                        q_len=jnp.int32(chunk),
                    )
                    tok, _, _, _ = ex.run_prefill(toks, meta, sp1, 0, 0)
            return tok

        t0 = time.perf_counter()
        prefill_once()  # compile
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            prefill_once()
            times.append((time.perf_counter() - t0) * 1e3)
        results[CHUNK] = dict(
            ttft_ms=round(min(times), 1),
            ttft_all=[round(t, 1) for t in times],
            compile_s=round(compile_s, 1),
            n_chunks=n_chunks,
        )
        print(json.dumps({"chunk": CHUNK, **results[CHUNK]}), flush=True)
        del ex

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
