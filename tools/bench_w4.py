"""On-chip W4A16 GEMM bench: packed 4-bit vs 8-bit-nibble vs bf16 dense.

Decode-shaped (M=16) GEMMs at Qwen2-72B / Llama-70B layer sizes — weight
streaming dominates, so packed int4 should approach 4x bf16.

Per-call wall time through the axon tunnel is dominated by ~1 ms dispatch
overhead, so each variant is measured as a CHAIN of n kernel calls over n
distinct weight buffers inside ONE jit program; device time per call is the
slope (T(n2) - T(n1)) / (n2 - n1), which cancels the constant overhead.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import zhilight_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.ops.pallas.quant_matmul import w4a16_matmul
from zhilight_tpu.ops.quant import pack_int4


def timeit(f, *args, n=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def slope_ms(one_call, w_stack, n1=2, n2=8):
    """Device ms/call: fori_loop over a stacked weight buffer (each iteration
    reads a different slice, so the call cannot be hoisted), timed at two
    loop lengths; the slope cancels constant dispatch/loop overhead. One
    kernel instance per program keeps remote compiles cheap."""
    import functools

    S = w_stack.shape[0]

    @functools.partial(jax.jit, static_argnums=2)
    def f(x, ws, n):
        def body(i, acc):
            return acc + one_call(x, ws[i % S]).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((x.shape[0], ws.shape[-1]), jnp.float32))

    t1 = timeit(f, X, w_stack, n1)
    t2 = timeit(f, X, w_stack, n2)
    return (t2 - t1) / (n2 - n1)


X = None


def run(name, K, N, M=16, gs=128, n2=4, variants=("packed", "bf16", "nibble")):
    global X
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    scales = jnp.asarray((rng.rand(K // gs, N) + 0.5) * 0.01, jnp.float32)
    zeros = jnp.asarray(np.full((K // gs, N), 8.0), jnp.float32)
    res = {}

    S = 4  # distinct weight buffers cycled by the loop
    base = rng.randint(0, 16, size=(K, N)).astype(np.int8)
    if "packed" in variants:
        packed_np = np.asarray(pack_int4(jnp.asarray(base)))
        stack = jnp.asarray(np.stack([packed_np + np.uint8(i % 2) for i in range(S)]))
        res["packed"] = slope_ms(lambda x, w: w4a16_matmul(x, w, scales, zeros), stack)
        stack.delete()

    if "bf16" in variants:
        stack = jnp.asarray(np.stack([rng.randn(K, N) * 0.01 for _ in range(S)]), jnp.bfloat16)
        res["bf16"] = slope_ms(
            lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype),
            stack,
        )
        stack.delete()

    if "nibble" in variants:
        stack = jnp.asarray(np.stack([base + np.int8(0) for _ in range(S)]))
        res["nibble"] = slope_ms(lambda x, w: w4a16_matmul(x, w, scales, zeros), stack)
        stack.delete()

    roof4 = K * N * 0.5 / 819e9 * 1000
    roof16 = K * N * 2 / 819e9 * 1000
    parts = "  ".join(f"{k} {v:7.3f} ms" for k, v in res.items())
    ratio = f"  speedup {res['bf16'] / res['packed']:4.2f}x" if {"bf16", "packed"} <= res.keys() else ""
    print(
        f"{name:26s} {parts}{ratio}  (rooflines 4b ~{roof4:.3f}, bf16 ~{roof16:.3f})",
        flush=True,
    )


SHAPES = {
    "72b-qkv": ("72B qkv  [8192, 10240]", 8192, 10240),
    "72b-ffn": ("72B ffn  [8192, 29696]", 8192, 29696),
    "8b-ffn": ("8B  ffn  [4096, 14336]", 4096, 14336),
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--shapes", default="72b-qkv,72b-ffn,8b-ffn")
    ap.add_argument("--variants", default="packed,bf16,nibble")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    for key in args.shapes.split(","):
        name, K, N = SHAPES[key]
        run(name, K, N, M=args.m, variants=tuple(args.variants.split(",")))
