"""On-chip correctness + honest timing for the paged decode kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention


def check(name, Hq, Hkv, D, B=16, CTX=512, S=16, blockspec=False, ppb=8):
    MAXP = CTX // S
    P = B * MAXP
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(P * S, Hkv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(P * S, Hkv, D), jnp.bfloat16)
    pt = jnp.asarray(np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32))
    cl = jnp.asarray(rng.randint(1, CTX, size=B).astype(np.int32))
    scale = 1.0 / np.sqrt(D)

    f = jax.jit(lambda q, k, v: paged_decode_attention(
        q, k, v, pt, cl, S, scale, pages_per_block=ppb, use_blockspec=blockspec))
    try:
        got = f(q, k, v)
        got.block_until_ready()
    except Exception as e:
        print(f"{name:44s} COMPILE FAIL: {str(e)[:100]}")
        return

    slots = (jnp.maximum(pt, 0)[..., None] * S + jnp.arange(S)).reshape(B, -1)
    want = decode_attention(q, k[slots], v[slots], cl, scale)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))

    # timing: vary q each iter via cheap add to defeat any caching
    N = 20
    qs = q
    t0 = time.perf_counter()
    for i in range(N):
        qs = f(qs * 1.0, k, v)[:, :Hq, :D] if False else f(q, k, v)
    qs.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    kv_bytes = 2 * float(jnp.sum(cl)) * Hkv * D * 2
    ideal_ms = kv_bytes / 819e9 * 1000
    print(f"{name:44s} err={err:.4f}  {dt*1000:7.3f} ms/layer (roofline {ideal_ms:.3f} ms)")


if __name__ == "__main__":
    check("minicpm MHA36 D64 manual", 36, 36, 64)
    check("minicpm MHA36 D64 blockspec", 36, 36, 64, blockspec=True)
    check("llama8b GQA32/8 D128 manual", 32, 8, 128)
    check("llama8b GQA32/8 D128 blockspec", 32, 8, 128, blockspec=True)
    check("mla-like MQA16/1 D576 manual", 16, 1, 576)
    check("mla-like MQA16/1 D576 blockspec", 16, 1, 576, blockspec=True)
    check("qwen72b-tp8 GQA8/1 D128 manual", 8, 1, 128)
