"""Profile the PRODUCTION decode window (ModelExecutor.run_decode_multi) on
chip — the same program bench.py times — and print the per-step op families."""

import glob
import json
import os
import re
import sys
from collections import defaultdict

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

    ex.run_decode_multi(
        tokens, page_tables, positions, context_lens, limits, sparams, K,
        greedy_only=True,
    )

    trace_dir = "/tmp/jax-trace-window"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            ex.run_decode_multi(
                tokens, page_tables, positions, context_lens, limits, sparams, K,
                greedy_only=True, reuse_carry=True,
            )

    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    obj = json.loads(bytes(data).decode())
    table = obj[0]
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
    dev = [r for r in rows if r.get("host_or_device") == "Device"]
    agg = defaultdict(float)
    cnt = defaultdict(float)
    steps = 3 * K
    for r in dev:
        fam = re.sub(r"[.\d]+$", "", str(r["operation"]))
        agg[fam] += float(r["total_self_time"])
        cnt[fam] += float(r["occurrences"])
    tot = sum(agg.values())
    print(f"window K={K}: total device self time {tot/1000/steps:.3f} ms/step")
    for n, t in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
        print(f"{t/1000/steps:8.3f} ms/step x{cnt[n]/steps:<7.1f} {n[:80]}")


if __name__ == "__main__":
    main()
