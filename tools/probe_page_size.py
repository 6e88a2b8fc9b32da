"""Page-size ablation: decode window + prefill chunk + full-prompt TTFT at
page_size in {16, 32, 64, 128} (MiniCPM-2B bench geometry, random weights).

The paged kernels DMA one page per async copy; at S=16 that is a 4 KB
transfer (S * 2D * 2B), far below the size needed to hide DMA latency, and
the profiled prefill-attention kernel runs ~8x under the HBM roofline.
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
    ap.add_argument("--pages", default="16,32,64,128")
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--prompt", type=int, default=3712)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--windows", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zhilight_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
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
    B, CTX, PROMPT = args.batch, args.ctx, args.prompt
    CHUNK = 512

    for PAGE in [int(p) for p in args.pages.split(",")]:
        MAX_PAGES = (CTX + args.windows * 8 + PAGE - 1) // PAGE + 1
        ecfg = EngineConfig(
            max_model_len=PROMPT + 16,
            cache=CacheConfig(
                page_size=PAGE,
                num_pages=max(B * MAX_PAGES, (PROMPT + 16) // PAGE + 8),
            ),
            scheduler=SchedulerConfig(
                max_batch=B, chunk_size=CHUNK, prefill_buckets=(CHUNK,)
            ),
        )
        params = L.init_params(cfg, jax.random.PRNGKey(0))
        ex = ModelExecutor(cfg, params, ecfg)
        K = ex.decode_window

        page_tables = np.stack(
            [b * MAX_PAGES + np.arange(MAX_PAGES) for b in range(B)]
        ).astype(np.int32)
        positions = np.full(B, CTX - 1, np.int32)
        context_lens = np.full(B, CTX, np.int32)
        limits = np.full(B, MAX_PAGES * PAGE - 1, np.int32)
        tokens = np.zeros(B, np.int32)
        sparams = SamplingParams.greedy(B)

        ex.run_decode_multi(
            tokens, page_tables, positions, context_lens, limits, sparams, K,
            greedy_only=True,
        )
        t0 = time.perf_counter()
        pending = None
        for w in range(args.windows):
            handle = ex.run_decode_multi(
                tokens, page_tables, positions, context_lens, limits, sparams,
                K, greedy_only=True, reuse_carry=True, fetch=False,
            )
            if pending is not None:
                ex.fetch(pending)
            pending = handle
        ex.fetch(pending)
        dt = time.perf_counter() - t0
        decode_tps = B * K * args.windows / dt

        # TTFT
        n_chunks = (PROMPT + CHUNK - 1) // CHUNK
        n_pages = (PROMPT + 1 + PAGE - 1) // PAGE
        pages = np.arange(n_pages, dtype=np.int32)
        ptoks = np.random.RandomState(0).randint(2, 1000, PROMPT).astype(np.int32)
        sp1 = SamplingParams.greedy(B)

        def prefill_once():
            for c in range(n_chunks):
                start = c * CHUNK
                chunk = min(CHUNK, PROMPT - start)
                bucket = ex.pick_bucket(chunk)
                toks = np.zeros(bucket, np.int32)
                toks[:chunk] = ptoks[start : start + chunk]
                pos = np.zeros(bucket, np.int32)
                pos[:chunk] = np.arange(start, start + chunk)
                slots = np.full(bucket, -1, np.int32)
                slots[:chunk] = np.arange(start, start + chunk)
                pt = np.full(ex.max_pages_per_seq, -1, np.int32)
                pt[:n_pages] = pages
                meta = PrefillMeta(
                    positions=jnp.asarray(pos),
                    slot_mapping=jnp.asarray(slots),
                    page_table=jnp.asarray(pt),
                    cache_len=jnp.int32(start),
                    q_len=jnp.int32(chunk),
                )
                if c + 1 < n_chunks:
                    ex.run_chunk(toks, meta)
                else:
                    tok, _, _, _ = ex.run_prefill(toks, meta, sp1, 0, 0)
            return tok

        prefill_once()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            prefill_once()
            ts.append((time.perf_counter() - t0) * 1e3)
        print(json.dumps({
            "page_size": PAGE,
            "decode_tok_s": round(decode_tps, 1),
            "ttft_ms": round(min(ts), 1),
        }), flush=True)
        del ex, params


if __name__ == "__main__":
    main()
