"""On-chip W4A16 GEMM bench: packed 4-bit vs 8-bit-nibble vs bf16 dense.

Decode-shaped (M=16) GEMMs at Qwen2-72B / Llama-70B layer sizes — weight
streaming dominates, so packed int4 should approach 4x bf16 and ~2x the
nibble kernel."""

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


def bench(f, *args, n=30):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def run(name, K, N, M=16, gs=128):
    rng = np.random.RandomState(0)
    w_nib = jnp.asarray(rng.randint(0, 16, size=(K, N)), jnp.int8)
    packed = pack_int4(w_nib)
    scales = jnp.asarray((rng.rand(K // gs, N) + 0.5) * 0.01, jnp.float32)
    zeros = jnp.asarray(np.full((K // gs, N), 8.0), jnp.float32)
    x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    w_bf = jnp.asarray(rng.randn(K, N), jnp.bfloat16)

    f_pack = jax.jit(lambda x, w: w4a16_matmul(x, w, scales, zeros))
    f_nib = jax.jit(lambda x, w: w4a16_matmul(x, w, scales, zeros))
    f_bf = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype))

    try:
        a = f_pack(x, packed); a.block_until_ready()
    except Exception as e:
        print(f"{name} packed FAIL {str(e)[:160]}")
        return
    b = f_nib(x, w_nib)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))

    t_pack = bench(f_pack, x, packed)
    t_nib = bench(f_nib, x, w_nib)
    t_bf = bench(f_bf, x, w_bf)
    roof4 = K * N * 0.5 / 819e9 * 1000
    print(
        f"{name:26s} err={err:.4f}  packed {t_pack:7.3f} ms  nibble {t_nib:7.3f} ms  "
        f"bf16 {t_bf:7.3f} ms  (4-bit roofline ~{roof4:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("72B qkv  [8192, 10240]", 8192, 10240)
    run("72B ffn  [8192, 29696]", 8192, 29696)
    run("8B  ffn  [4096, 14336]", 4096, 14336)
