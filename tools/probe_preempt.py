"""Preempt-resume cost: recompute prefill vs host KV swap, measured.

VERDICT r4 #8: quantify what a preemption costs at long context under the
two modes (reference SwapBuf, batch_generator.cpp:329-358 vs this engine's
default recompute-from-pages). Prints one JSON line with:

  * recompute_ms — re-prefill of a ctx-token context through the real chunk
    programs (chains + fused chunks, what resume_decode actually runs)
  * swap_out_ms / swap_in_ms — executor swap_out_rows / swap_in_rows of the
    same context's rows (device<->host via the runtime's transfer path)

Usage: python tools/probe_preempt.py [--model-path /tmp/minicpm2b] [--ctx 3712]
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
    ap.add_argument("--model-path", default="/tmp/minicpm2b")
    ap.add_argument("--ctx", type=int, default=3712)
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax.numpy as jnp

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.llm import LLM

    ecfg = EngineConfig(
        model_path=args.model_path,
        max_model_len=args.ctx + 128,
        cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_batch=4, chunk_size=args.chunk),
    )
    llm = LLM(model_path=args.model_path, engine_config=ecfg)
    ex = llm.executor
    S = ex.page_size
    CTX = args.ctx
    n_pages = (CTX + S - 1) // S
    pages = np.arange(n_pages, dtype=np.int32)
    toks = np.random.RandomState(0).randint(2, 1000, CTX).astype(np.int32)

    pt = np.full(ex.max_pages_per_seq, -1, np.int32)
    pt[:n_pages] = pages
    pt_dev = jnp.asarray(pt)

    def recompute():
        # what resume_decode runs: pure cache-write chunks over the whole
        # context (chains when available)
        c, n_chunks = 0, (CTX + args.chunk - 1) // args.chunk
        while c < n_chunks:
            start = c * args.chunk
            chunk = min(args.chunk, CTX - start)
            chainable = n_chunks - c
            if chunk == args.chunk and ex.supports_fused_chunk and chainable >= 2:
                C = next((x for x in ex.CHAIN_SIZES if x <= chainable), None)
                if C is not None:
                    ex.run_chunk_chain(
                        toks[start : start + C * args.chunk].reshape(C, -1),
                        pt_dev, start,
                    )
                    c += C
                    continue
            if ex.supports_fused_chunk:
                b = ex.pick_bucket(chunk)
                t = np.zeros(b, np.int32)
                t[:chunk] = toks[start : start + chunk]
                ex.run_chunk_fused(t, pt_dev, start, chunk)
            c += 1
        import jax

        jax.block_until_ready(jax.tree.leaves(ex.cache)[0])

    rows = (pages.astype(np.int64)[:, None] * S + np.arange(S)).reshape(-1).astype(np.int32)

    # compile + warm both paths
    recompute()
    st = ex.swap_out_rows(rows)
    ex.swap_in_rows(rows, st)

    t0 = time.perf_counter(); recompute(); recompute_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter(); st = ex.swap_out_rows(rows)
    swap_out_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter(); ex.swap_in_rows(rows, st)
    swap_in_ms = (time.perf_counter() - t0) * 1e3

    kv_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in st
    ) if isinstance(st, (list, tuple)) else "n/a"
    print(json.dumps({
        "ctx": CTX,
        "recompute_ms": round(recompute_ms, 1),
        "swap_out_ms": round(swap_out_ms, 1),
        "swap_in_ms": round(swap_in_ms, 1),
        "swap_total_ms": round(swap_out_ms + swap_in_ms, 1),
        "kv_bytes": kv_bytes,
    }))


if __name__ == "__main__":
    main()
