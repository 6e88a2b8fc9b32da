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


def slope_ms(one_call, weights, n1=1, n2=4):
    """Device ms/call from chained jits of length n1 and n2."""

    def chain(n):
        ws = weights[:n]

        @jax.jit
        def f(x, *ws):
            acc = None
            for w in ws:
                y = one_call(x, w)
                acc = y if acc is None else acc + y
            return acc

        return f

    f1, f2 = chain(n1), chain(n2)
    t1 = timeit(f1, *([X] + weights[:n1]))
    t2 = timeit(f2, *([X] + weights[:n2]))
    return (t2 - t1) / (n2 - n1)


X = None


def run(name, K, N, M=16, gs=128, n2=4):
    global X
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    scales = jnp.asarray((rng.rand(K // gs, N) + 0.5) * 0.01, jnp.float32)
    zeros = jnp.asarray(np.full((K // gs, N), 8.0), jnp.float32)

    base = rng.randint(0, 16, size=(K, N)).astype(np.int8)
    packed_np = np.asarray(pack_int4(jnp.asarray(base)))
    packed = [jnp.asarray(packed_np) + jnp.uint8(i % 2) for i in range(n2)]
    t_pack = slope_ms(lambda x, w: w4a16_matmul(x, w, scales, zeros), packed, n2=n2)
    err_ref = w4a16_matmul(X, packed[0], scales, zeros)

    bf = [jnp.asarray(rng.randn(K, N) * 0.01, jnp.bfloat16) for _ in range(n2)]
    t_bf = slope_ms(
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype),
        bf,
        n2=n2,
    )
    for w in bf:
        w.delete()

    nib = [jnp.asarray(base) + jnp.int8(0) for _ in range(n2)]
    t_nib = slope_ms(lambda x, w: w4a16_matmul(x, w, scales, zeros), nib, n2=n2)
    b = w4a16_matmul(X, nib[0], scales, zeros)
    err = float(jnp.max(jnp.abs(err_ref.astype(jnp.float32) - b.astype(jnp.float32))))
    for w in nib + packed:
        w.delete()

    roof4 = K * N * 0.5 / 819e9 * 1000
    roof16 = K * N * 2 / 819e9 * 1000
    print(
        f"{name:26s} err={err:.4f}  packed {t_pack:7.3f} ms  nibble {t_nib:7.3f} ms  "
        f"bf16 {t_bf:7.3f} ms  speedup {t_bf / t_pack:4.2f}x  "
        f"(rooflines 4b ~{roof4:.3f}, bf16 ~{roof16:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    run("72B qkv  [8192, 10240]", 8192, 10240, M=args.m)
    run("72B ffn  [8192, 29696]", 8192, 29696, M=args.m)
    run("8B  ffn  [4096, 14336]", 4096, 14336, M=args.m)
