"""Benchmark: offline decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (round 1): Llama-2-7B-shaped dense model, bf16, random weights,
continuous batched greedy decode — tokens/s/chip on the serving decode step.
Baseline reference point: ZhiLight's Llama-family TPOT numbers (BASELINE.md);
vs_baseline compares decode tokens/s against ZhiLight's MiniCPM-2B-class
single-GPU TPOT-derived rate scaled for model size (placeholder until the
full QPS/TTFT/TPOT load harness lands in a later round).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.kvcache import new_kv_cache
    from zhilight_tpu.models import llama as L
    from zhilight_tpu.models.base import DecodeMeta

    # MiniCPM-2B geometry (reference single-GPU baseline row: QPS 1.67 /
    # TPOT 26.1ms on 1xAD102, BASELINE.md) — random weights; decode perf
    # depends only on shapes. Fits one v5e chip in bf16.
    cfg = ModelConfig(
        model_type="cpm_dragonfly",
        num_layers=40,
        dim_model=2304,
        num_heads=36,
        dim_head=64,
        num_kv_heads=36,
        dim_ff=5760,
        vocab_size=122753,
        dtype="bfloat16",
        scale_emb=12.0,
        scale_depth=1.4,
        dim_model_base=256,
        tie_lm_head=True,
    )
    BATCH = 16
    PAGE = 16
    CTX = 512  # context length during decode
    MAX_PAGES = CTX // PAGE
    STEPS = 32

    rope = L.build_rope(cfg)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    cache = new_kv_cache(
        cfg.num_layers, BATCH * MAX_PAGES, PAGE, cfg.num_kv_heads, cfg.dim_head
    )

    pos = CTX - 1
    page_tables = np.stack(
        [b * MAX_PAGES + np.arange(MAX_PAGES) for b in range(BATCH)]
    ).astype(np.int32)
    meta = DecodeMeta(
        positions=jnp.full((BATCH,), pos, jnp.int32),
        slot_mapping=jnp.asarray(
            page_tables[:, pos // PAGE] * PAGE + pos % PAGE, jnp.int32
        ),
        page_tables=jnp.asarray(page_tables),
        context_lens=jnp.full((BATCH,), CTX, jnp.int32),
    )
    tokens = jnp.zeros((BATCH,), jnp.int32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tokens, cache, meta):
        logits, cache = L.forward_decode(params, cfg, rope, tokens, meta, cache)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    # warmup/compile
    tokens, cache = step(params, tokens, cache, meta)
    tokens.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(STEPS):
        tokens, cache = step(params, tokens, cache, meta)
    tokens.block_until_ready()
    dt = time.perf_counter() - t0

    toks_per_s = BATCH * STEPS / dt
    # ZhiLight MiniCPM-2B on 1xAD102: TPOT mean 26.1ms (BASELINE.md). At an
    # equivalent 16-stream decode batch that is 16/0.0261 = 613 tok/s/device.
    baseline = 613.0
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_minicpm2b_bf16_b16",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(toks_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
