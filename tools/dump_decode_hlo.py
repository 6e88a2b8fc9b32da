"""Dump the compiled decode-window HLO and summarize async slice/copy ops."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import numpy as np


def main():
    import jax

    from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
    from zhilight_tpu.engine.engine import ModelExecutor
    from zhilight_tpu.models import llama as L
    from zhilight_tpu.ops.sampling import SamplingParams

    cfg = ModelConfig(
        model_type="cpm_dragonfly", num_layers=40, dim_model=2304, num_heads=36,
        dim_head=64, num_kv_heads=36, dim_ff=5760, vocab_size=122753,
        dtype="bfloat16", scale_emb=12.0, scale_depth=1.4, dim_model_base=256,
        tie_lm_head=True,
    )
    BATCH, PAGE, CTX, MAX_PAGES = 16, 16, 512, 34
    ecfg = EngineConfig(
        max_model_len=MAX_PAGES * PAGE,
        cache=CacheConfig(page_size=PAGE, num_pages=BATCH * MAX_PAGES),
        scheduler=SchedulerConfig(max_batch=BATCH),
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    ex = ModelExecutor(cfg, params, ecfg)
    K = ex.decode_window

    page_tables = np.stack(
        [b * MAX_PAGES + np.arange(MAX_PAGES) for b in range(BATCH)]
    ).astype(np.int32)
    positions = np.full(BATCH, CTX - 1, np.int32)
    context_lens = np.full(BATCH, CTX, np.int32)
    limits = np.full(BATCH, MAX_PAGES * PAGE - 1, np.int32)
    tokens = np.zeros(BATCH, np.int32)
    sparams = SamplingParams.greedy(BATCH)
    import jax.numpy as jnp

    fn = ex._get(
        ("decode_multi", K, 0, 0, 0, True),
        lambda: ex._decode_multi_fn(K, 0, 0, 0, True),
    )
    bias_tok, bias_val, _ = ex._pair(None, None, rows=BATCH)
    lowered = fn.lower(
        ex.params,
        jax.device_put(jnp.asarray(tokens), ex._rep),
        ex.cache,
        ex.sampler_state,
        jax.device_put(jnp.asarray(page_tables), ex._rep),
        jax.device_put(jnp.asarray(positions), ex._rep),
        jax.device_put(jnp.asarray(context_lens), ex._rep),
        jax.device_put(jnp.asarray(limits), ex._rep),
        sparams,
        ex.base_key,
        bias_tok,
        bias_val,
        bias_tok,
        bias_val,
    )
    txt = lowered.compile().as_text()
    open("/tmp/decode_window.hlo", "w").write(txt)
    # count async/dynamic slice ops by result shape
    shapes = Counter()
    for line in txt.splitlines():
        m = re.search(r"(dynamic-slice|slice)\(", line)
        if m and ("async" in line or "slice(" in line):
            shp = re.match(r"\s*%?\S+ = (\S+?) ", line)
            if shp:
                shapes[(m.group(1), shp.group(1)[:40])] += 1
    for k, v in shapes.most_common(20):
        print(v, k)
    print("wrote /tmp/decode_window.hlo", len(txt), "bytes")


if __name__ == "__main__":
    main()
