"""fp8_linear fusion check (VERDICT r3 #8 / r2 #9).

Measures DEVICE time (profiler self-time) of the fp8 block-scaled linear at
decode shapes vs a bf16 dot of the same geometry. If XLA fuses the dequant
into the weight stream, fp8 reads 1 byte/weight and should take ~half the
bf16 dot's time; if it materializes a bf16 copy in HBM it reads 3+
bytes/weight and comes out slower than bf16.

Usage: python tools/probe_fp8.py [--k 7168] [--n 8192] [--m 16]
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


def dev_ms(fn, *args, n=20):
    import jax

    jax.device_get(fn(*args))
    td = "/tmp/jax-trace-fp8"
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        for _ in range(n):
            r = fn(*args)
        jax.device_get(r)
    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{td}/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    obj = json.loads(bytes(data).decode())
    table = obj[0] if isinstance(obj, list) else obj
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
    return sum(
        float(r["total_self_time"]) for r in rows if r.get("host_or_device") == "Device" and r.get("operation", r.get("op_name", "")) != "IDLE"
    ) / n / 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=7168)   # DeepSeek-V3 hidden
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--m", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zhilight_tpu.ops.quant import fp8_linear

    K, N, M = args.k, args.n, args.m
    B = 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K) * 0.1, jnp.bfloat16)
    w8 = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float8_e4m3fn)
    bs = jnp.asarray(rng.rand(K // B, N // B) * 0.01 + 0.005, jnp.float32)
    wbf = jnp.asarray(rng.randn(K, N) * 0.01, jnp.bfloat16)

    f_fp8 = jax.jit(lambda x, w, s: fp8_linear({"w_f8": w, "block_scale": s}, x))
    f_bf16 = jax.jit(
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    )

    t8 = dev_ms(f_fp8, x, w8, bs)
    t16 = dev_ms(f_bf16, x, wbf)
    gb8 = K * N / 1e9
    out = {
        "shape": [M, K, N],
        "fp8_ms": round(t8, 4),
        "bf16_ms": round(t16, 4),
        "fp8_bytes_per_weight": round(t8 / 1000 * 756e9 / (K * N), 2),
        "verdict": (
            "fused (<=1.5 B/w)" if t8 / 1000 * 756e9 / (K * N) <= 1.5
            else "materializes bf16 copy"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
