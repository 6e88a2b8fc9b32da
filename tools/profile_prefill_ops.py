"""Per-op device-time breakdown of the production prefill-chunk program at
bench geometry (MiniCPM-2B, random in-memory weights) — the profile artifact
behind the TTFT work (VERDICT r3 ask #3).

Usage: python tools/profile_prefill_ops.py [--chunk 512] [--layers 40] [--top 30]
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import numpy as np


def op_stats(trace_dir, n_calls):
    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, "no trace written"
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    obj = json.loads(bytes(data).decode())
    table = obj[0] if isinstance(obj, list) else obj
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
    dev = [r for r in rows if r.get("host_or_device") == "Device" and r.get("operation", r.get("op_name", "")) != "IDLE"]
    out = [
        (float(r["total_self_time"]) / n_calls / 1000.0,
         r.get("operation", r.get("op_name", "?")))
        for r in dev
    ]
    out.sort(reverse=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--layers", type=int, default=40)
    ap.add_argument("--cache-len", type=int, default=0,
                    help="existing context before the chunk (mid-prompt chunks)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zhilight_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from zhilight_tpu.engine.engine import ModelExecutor
    from zhilight_tpu.models import llama as L
    from zhilight_tpu.models.base import PrefillMeta

    cfg = ModelConfig(
        model_type="cpm_dragonfly", num_layers=args.layers, dim_model=2304,
        num_heads=36, dim_head=64, num_kv_heads=36, dim_ff=5760,
        vocab_size=122753, dtype="bfloat16", scale_emb=12.0, scale_depth=1.4,
        dim_model_base=256, tie_lm_head=True,
    )
    T = args.chunk
    START = args.cache_len
    PAGE = 16
    total = START + T
    ecfg = EngineConfig(
        max_model_len=total + 16,
        cache=CacheConfig(page_size=PAGE, num_pages=(total + 16) // PAGE + 8),
        scheduler=SchedulerConfig(max_batch=4, chunk_size=T, prefill_buckets=(T,)),
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    ex = ModelExecutor(cfg, params, ecfg)

    n_pages = (total + PAGE - 1) // PAGE
    toks = np.random.RandomState(0).randint(2, 1000, T).astype(np.int32)
    pt = np.full(ex.max_pages_per_seq, -1, np.int32)
    pt[:n_pages] = np.arange(n_pages)
    pos = np.arange(START, START + T, dtype=np.int32)
    meta = PrefillMeta(
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(pos // PAGE * PAGE + pos % PAGE),
        page_table=jnp.asarray(pt),
        cache_len=jnp.int32(START),
        q_len=jnp.int32(T),
    )

    def chunk():
        ex.run_chunk(toks, meta)
        return jax.tree.leaves(ex.cache)[0]

    jax.block_until_ready(chunk())  # compile
    trace_dir = "/tmp/jax-trace-prefill-ops"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(args.reps):
            r = chunk()
        jax.block_until_ready(r)
    ops = op_stats(trace_dir, args.reps)
    total_ms = sum(t for t, _ in ops)
    flops = 2 * sum(
        int(np.prod(v.shape)) for k, v in jax.tree_util.tree_leaves_with_path(ex.params)
        if hasattr(v, "shape") and len(v.shape) >= 2
    ) * T
    print(f"\n== prefill chunk T={T} cache_len={START} layers={args.layers}: "
          f"{total_ms:.3f} ms/chunk  (~{flops/1e9:.0f} GFLOP => "
          f"{flops/total_ms/1e9:.1f} TFLOP/s) ==")
    for t, name in ops[: args.top]:
        print(f"  {t:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
