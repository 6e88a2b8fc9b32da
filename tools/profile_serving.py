"""Profile the PRODUCTION decode-window and prefill-chunk programs of a real
checkpoint on the chip, printing per-op device-time breakdowns.

Unlike profile_decode.py (bare forward, random small geometry), this loads a
checkpoint through the executor — same programs the server runs — so kernel
choices (quant GEMMs, paged attention, window-KV flush, sampler) and their
costs match serving exactly.

Usage:
    python tools/profile_serving.py --model-path /tmp/qwen14b-gptq \
        --batch 8 --ctx 512 [--what decode,prefill] [--top 25]
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
    out = []
    for r in dev:
        out.append((float(r["total_self_time"]) / n_calls / 1000.0, r.get("operation", r.get("op_name", "?"))))
    out.sort(reverse=True)
    return out


def profile(fn, trace_dir, n):
    import jax

    fn()  # compile/warm
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
    return op_stats(trace_dir, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--what", default="decode,prefill")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--kv-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.llm import LLM
    from zhilight_tpu.models.base import PrefillMeta
    from zhilight_tpu.ops.sampling import SamplingParams

    B = args.batch
    CTX = args.ctx
    max_len = max(CTX + 256, args.chunk + 128)
    ecfg = EngineConfig(
        model_path=args.model_path,
        max_model_len=max_len,
        cache=CacheConfig(page_size=16, kv_dtype=args.kv_dtype),
        scheduler=SchedulerConfig(max_batch=B, chunk_size=args.chunk),
    )
    llm = LLM(model_path=args.model_path, engine_config=ecfg)
    ex = llm.executor
    S = ex.page_size
    K = ex.decode_window
    print(f"backend={jax.default_backend()} window={K} pages={ex.num_pages}", flush=True)

    if "decode" in args.what:
        maxp = (CTX + S - 1) // S + 2
        page_tables = np.stack(
            [b * maxp + np.arange(maxp) for b in range(B)]
        ).astype(np.int32)
        positions = np.full(B, CTX - 1, np.int32)
        context_lens = np.full(B, CTX, np.int32)
        limits = np.full(B, maxp * S - 1, np.int32)
        tokens = np.zeros(B, np.int32)
        sparams = SamplingParams.greedy(B)

        def step():
            return ex.run_decode_multi(
                tokens, page_tables, positions, context_lens, limits, sparams,
                K, greedy_only=True, reuse_carry=True, fetch=False,
            )

        ops = profile(step, "/tmp/jax-trace-serve-dec", args.reps)
        total = sum(t for t, _ in ops)
        print(f"\n== decode window (B={B}, K={K}, ctx={CTX}): "
              f"{total:.3f} ms/window = {total / K:.3f} ms/step ==")
        for t, name in ops[: args.top]:
            print(f"  {t:8.3f} ms  {name}")

    if "prefill" in args.what:
        T = args.chunk
        n_pages = (T + S - 1) // S
        pages = np.arange(n_pages, dtype=np.int32)
        toks = np.random.RandomState(0).randint(2, 1000, T).astype(np.int32)
        pt = np.full(ex.max_pages_per_seq, -1, np.int32)
        pt[:n_pages] = pages
        meta = PrefillMeta(
            positions=jnp.asarray(np.arange(T, dtype=np.int32)),
            slot_mapping=jnp.asarray(pages.repeat(S)[:T] * S + np.arange(T) % S),
            page_table=jnp.asarray(pt),
            cache_len=jnp.int32(0),
            q_len=jnp.int32(T),
        )

        def chunk():
            ex.run_chunk(toks, meta)
            return ex.cache.k

        ops = profile(chunk, "/tmp/jax-trace-serve-pre", args.reps)
        total = sum(t for t, _ in ops)
        flops = 2 * sum(
            x.size for x in jax.tree.leaves(ex.params)
            if x.dtype != jnp.float32
        ) * T  # rough: 2*params*T (packed int4 counts 2/byte... report raw)
        print(f"\n== prefill chunk (T={T}): {total:.3f} ms/chunk ==")
        for t, name in ops[: args.top]:
            print(f"  {t:8.3f} ms  {name}")

    print("\ndone")


if __name__ == "__main__":
    main()
