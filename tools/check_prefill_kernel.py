"""On-chip validation + A/B bench of the Pallas chunked-prefill kernel.

Compares ``paged_prefill_attention_hm`` against the XLA full-gather path
(``ops.attention.prefill_attention``) for accuracy, then times both at
serving-like shapes (chunked prefill of a long context) to quantify the TTFT
win. Run on the TPU chip:

    JAX_COMPILATION_CACHE_DIR=/tmp/jax-comp-cache python tools/check_prefill_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import zhilight_tpu  # noqa: F401  (compile-cache hookup)
from zhilight_tpu.ops.attention import prefill_attention
from zhilight_tpu.ops.pallas.prefill_attention import paged_prefill_attention_hm

S = 16


def make_case(T, ctx_total, Hq, Hkv, D, seed=0):
    rng = np.random.RandomState(seed)
    P = (ctx_total + S - 1) // S + 3
    q = rng.randn(T, Hq, D).astype(np.float32) * 0.3
    k = rng.randn(P * S, Hkv, D).astype(np.float32) * 0.3
    v = rng.randn(P * S, Hkv, D).astype(np.float32) * 0.3
    maxp = (ctx_total + S - 1) // S
    pages = rng.permutation(P)[:maxp].astype(np.int32)
    pool = np.concatenate([k, v], axis=-1).transpose(1, 0, 2)
    return q, k, v, pages, pool


def check_accuracy():
    print("== accuracy (bf16 on-chip vs fp32 XLA reference) ==")
    for (T, cache_len, q_len, Hq, Hkv, D) in [
        (128, 0, 100, 32, 8, 128),     # llama-8B first chunk
        (512, 480, 512, 32, 8, 128),   # mid-sequence chunk
        (128, 37, 128, 8, 2, 64),      # unaligned resume
    ]:
        total = cache_len + q_len
        q, k, v, pages, pool = make_case(T, total, Hq, Hkv, D, seed=total)
        scale = 1.0 / np.sqrt(D)
        got = jax.jit(
            lambda q_, p_, t_: paged_prefill_attention_hm(
                q_, p_, t_, jnp.int32(cache_len), jnp.int32(q_len), S, scale
            )
        )(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(pool, jnp.bfloat16),
            jnp.asarray(pages),
        )
        slots = (pages[:, None] * S + np.arange(S)).reshape(-1)
        want = prefill_attention(
            jnp.asarray(q), jnp.asarray(k)[slots], jnp.asarray(v)[slots],
            jnp.int32(cache_len), jnp.int32(q_len), scale, 0,
        )
        g = np.asarray(got, np.float32)[:q_len]
        w = np.asarray(want, np.float32)[:q_len]
        err = np.max(np.abs(g - w)) / (np.max(np.abs(w)) + 1e-9)
        print(f"  T={T} cache={cache_len} q_len={q_len} Hq={Hq}: rel_err={err:.4f}")
        assert err < 0.03, err


def bench(T, ctx_total, Hq, Hkv, D, iters=20):
    """Time one chunk's attention at cache_len = ctx_total - T."""
    cache_len, q_len = ctx_total - T, T
    q, k, v, pages, pool = make_case(T, ctx_total, Hq, Hkv, D)
    scale = 1.0 / np.sqrt(D)
    qd = jnp.asarray(q, jnp.bfloat16)
    poold = jnp.asarray(pool, jnp.bfloat16)
    pagesd = jnp.asarray(pages)
    kd = jnp.asarray(k, jnp.bfloat16)
    vd = jnp.asarray(v, jnp.bfloat16)

    flash = jax.jit(
        lambda q_, p_, t_: paged_prefill_attention_hm(
            q_, p_, t_, jnp.int32(cache_len), jnp.int32(q_len), S, scale
        )
    )
    slots = (pages[:, None] * S + np.arange(S)).reshape(-1)
    slotsd = jnp.asarray(slots)

    def _xla(q_, k_, v_, sl):
        ck, cv = k_[sl], v_[sl]
        return prefill_attention(
            q_, ck, cv, jnp.int32(cache_len), jnp.int32(q_len), scale, 0
        )

    xla = jax.jit(_xla)

    out = {}
    for name, fn, args in [
        ("flash", flash, (qd, poold, pagesd)),
        ("xla-gather", xla, (qd, kd, vd, slotsd)),
    ]:
        r = fn(*args)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters * 1e3
        out[name] = dt
    print(
        f"  T={T} ctx={ctx_total} Hq={Hq}x{D}: flash {out['flash']:.3f} ms  "
        f"xla {out['xla-gather']:.3f} ms  speedup {out['xla-gather']/out['flash']:.2f}x"
    )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    check_accuracy()
    print("== bench: per-chunk attention (llama-8B geometry) ==")
    for ctx in (2048, 8192, 16384):
        bench(512, ctx, 32, 8, 128)
    print("== bench: MiniCPM-2B geometry (Hq=36 D=64) ==")
    for ctx in (2048, 8192):
        bench(512, ctx, 36, 36, 64)
    print("OK")
