"""On-chip W4A16 GEMM bench: packed 4-bit vs 8-bit-nibble vs bf16 dense.

Decode-shaped (M=16) GEMMs at Qwen2-72B / Llama-70B layer sizes — weight
streaming dominates, so packed int4 should approach 4x bf16.

Per-call wall time through the axon tunnel is dominated by ~1 ms dispatch
overhead, and chained/looped multi-call programs compile pathologically
through the remote helper, so each variant is a plain single-call jit
measured by DEVICE self time from a jax.profiler trace over N calls.
"""

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import zhilight_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.ops.pallas.quant_matmul import w4a16_matmul
from zhilight_tpu.ops.quant import pack_int4

N_TRACE = 30


def profile_ms(f, *args):
    """Total device self time per call from a profiler trace of N_TRACE calls."""
    r = f(*args)
    jax.block_until_ready(r)
    trace_dir = "/tmp/jax-trace-w4"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(N_TRACE):
            r = f(*args)
        jax.block_until_ready(r)

    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, "no trace written"
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    obj = json.loads(bytes(data).decode())
    table = obj[0] if isinstance(obj, list) else obj
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
    us = sum(
        float(r["total_self_time"])
        for r in rows
        if r.get("host_or_device") == "Device" and r.get("operation", r.get("op_name", "")) != "IDLE"
    )
    return us / N_TRACE / 1000.0


X = None


def run(name, K, N, M=16, gs=128, variants=("packed", "bf16", "nibble"), quiet=False):
    global X
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    scales = jnp.asarray((rng.rand(K // gs, N) + 0.5) * 0.01, jnp.float32)
    zeros = jnp.asarray(np.full((K // gs, N), 8.0), jnp.float32)
    res = {}

    base = rng.randint(0, 16, size=(K, N)).astype(np.int8)
    if "packed" in variants:
        w = jnp.asarray(pack_int4(jnp.asarray(base)))
        res["packed"] = profile_ms(
            jax.jit(lambda x, w: w4a16_matmul(x, w, scales, zeros)), X, w
        )
        w.delete()

    if "bf16" in variants:
        w = jnp.asarray(rng.randn(K, N) * 0.01, jnp.bfloat16)
        res["bf16"] = profile_ms(
            jax.jit(
                lambda x, w: jnp.dot(
                    x, w, preferred_element_type=jnp.float32
                ).astype(x.dtype)
            ),
            X,
            w,
        )
        w.delete()

    if "nibble" in variants:
        w = jnp.asarray(base)
        res["nibble"] = profile_ms(
            jax.jit(lambda x, w: w4a16_matmul(x, w, scales, zeros)), X, w
        )
        w.delete()

    if "xla" in variants:
        # XLA dequant-then-dot fallback (ops/quant.int4_linear without
        # Pallas): materializes a bf16 weight per call — the shape-aware
        # dispatch question (VERDICT r4 weak #6) is whether this ever beats
        # the fused kernel at small-ffn shapes
        from zhilight_tpu.ops.quant import dequant_int4

        w = jnp.asarray(pack_int4(jnp.asarray(base)))

        def xla_path(x, w):
            wd = dequant_int4(w, scales, zeros, x.dtype)
            return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(x.dtype)

        res["xla"] = profile_ms(jax.jit(xla_path), X, w)
        w.delete()

    roof4 = K * N * 0.5 / 819e9 * 1000
    roof16 = K * N * 2 / 819e9 * 1000
    parts = "  ".join(f"{k} {v:7.3f} ms" for k, v in res.items())
    ratio = (
        f"  speedup {res['bf16'] / res['packed']:4.2f}x"
        if {"bf16", "packed"} <= res.keys()
        else ""
    )
    if not quiet:
        print(
            f"{name:26s} {parts}{ratio}  (rooflines 4b ~{roof4:.3f}, bf16 ~{roof16:.3f})",
            flush=True,
        )
    return res


SHAPES = {
    "72b-qkv": ("72B qkv  [8192, 10240]", 8192, 10240),
    "72b-ffn": ("72B ffn  [8192, 29696]", 8192, 29696),
    "8b-ffn": ("8B  ffn  [4096, 14336]", 4096, 14336),
    # Qwen2.5-14B serving-bench shapes
    "14b-qkv": ("14B qkv  [5120, 7168]", 5120, 7168),
    "14b-ffn": ("14B ffn  [5120, 27648]", 5120, 27648),
    "14b-down": ("14B down [13824, 5120]", 13824, 5120),
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--shapes", default="72b-qkv,72b-ffn,8b-ffn")
    ap.add_argument("--variants", default="packed,bf16,nibble")
    ap.add_argument(
        "--json", action="store_true",
        help="print ONE JSON line: per-shape ms per variant + packed/bf16 ratio",
    )
    args = ap.parse_args()
    if not args.json:
        print("backend:", jax.default_backend(), flush=True)
    out = {}
    for key in args.shapes.split(","):
        name, K, N = SHAPES[key]
        res = run(
            name, K, N, M=args.m, variants=tuple(args.variants.split(",")),
            quiet=args.json,
        )
        row = {k: round(v, 3) for k, v in res.items()}
        if {"bf16", "packed"} <= res.keys():
            row["speedup_vs_bf16"] = round(res["bf16"] / res["packed"], 2)
        out[key] = row
    if args.json:
        print(json.dumps(out), flush=True)
