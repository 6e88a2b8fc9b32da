"""Time the paged decode attention kernel on the real chip for key geometries."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, Hq, Hkv, D, B=16, CTX=512, S=16, layers=40, ppb=8, blockspec=False):
    from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention

    MAXP = CTX // S
    P = B * MAXP
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    pt = jnp.asarray(
        np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32)
    )
    cl = jnp.full((B,), CTX, jnp.int32)
    # distinct arrays per layer, else XLA CSEs the 40 calls into one
    ks = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (P * S, Hkv, D), jnp.bfloat16)
        for i in range(layers)
    )
    vs = tuple(
        jax.random.normal(jax.random.PRNGKey(1000 + i), (P * S, Hkv, D), jnp.bfloat16)
        for i in range(layers)
    )

    @jax.jit
    def run(q, ks, vs, pt, cl):
        outs = []
        for i in range(layers):
            outs.append(
                paged_decode_attention(
                    q, ks[i], vs[i], pt, cl, S, 0.125,
                    pages_per_block=ppb, use_blockspec=blockspec,
                )
            )
        return sum(outs)

    try:
        r = run(q, ks, vs, pt, cl)
        r.block_until_ready()
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(10):
        r = run(q, ks, vs, pt, cl)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    # ideal: read all KV once
    kv_bytes = 2 * B * CTX * Hkv * D * 2 * layers
    ideal_ms = kv_bytes / 819e9 * 1000
    print(f"{name:40s} {dt*1000:8.2f} ms   (roofline {ideal_ms:.2f} ms, {dt*1000/ideal_ms:.1f}x)")


if __name__ == "__main__":
    # MiniCPM-2B: MHA 36 heads D=64
    bench("minicpm MHA36 D64 manual ppb8", 36, 36, 64)
    bench("minicpm MHA36 D64 blockspec fpb8", 36, 36, 64, blockspec=True)
    # Llama-3.1-8B: GQA 32/8 D=128
    bench("llama8b GQA32/8 D128 manual ppb8", 32, 8, 128, layers=32)
    bench("llama8b GQA32/8 D128 blockspec fpb8", 32, 8, 128, layers=32, blockspec=True)
    # Qwen2-72B: GQA 64/8 D=128 (per-chip TP=8 slice: 8/1)
    bench("qwen72b tp8 GQA8/1 D128 manual", 8, 1, 128, layers=80)
