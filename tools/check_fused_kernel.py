"""On-chip correctness + timing for the fused write+attend decode kernel.

Compares against the separate write_kv-then-paged_decode_attention sequence
on the real chip, for the packed MiniCPM geometry and the split llama GQA
geometry, and times both (per-layer)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.ops.pallas.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_fused,
)
from zhilight_tpu.ops.pallas.kv_write import write_rows_2d, write_rows_2d_pair, paged_write_rows


def check(name, Hq, Hkv, D, packed, B=16, CTX=512, S=16):
    MAXP = CTX // S
    P = B * MAXP
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.bfloat16)
    kf = rng.randn(P * S, Hkv, D).astype(np.float32)
    vf = rng.randn(P * S, Hkv, D).astype(np.float32)
    k_new = jnp.asarray(rng.randn(B, Hkv, D), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, Hkv, D), jnp.bfloat16)
    pt = jnp.asarray(np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32))
    cl_np = rng.randint(1, CTX, size=B).astype(np.int32)
    cl = jnp.asarray(cl_np)
    slots_np = np.array(
        [int(pt[b, (cl_np[b] - 1) // S]) * S + (cl_np[b] - 1) % S for b in range(B)],
        np.int32,
    )
    slots = jnp.asarray(slots_np)
    scale = 1.0 / np.sqrt(D)

    if packed:
        pool = jnp.asarray(np.concatenate([kf, vf], axis=-1), jnp.bfloat16)

        @jax.jit
        def fused(pool, q, k_new, v_new):
            out, kv, _ = paged_decode_attention_fused(
                q, pool, None, k_new, v_new, slots, pt, cl, S, scale
            )
            return out, kv

        @jax.jit
        def separate(pool, q, k_new, v_new):
            rows = jnp.concatenate(
                [k_new.astype(pool.dtype), v_new.astype(pool.dtype)], axis=-1
            )
            pool = write_rows_2d(pool, rows, slots, S)
            out = paged_decode_attention(
                q, pool, pool, pt, cl, S, scale, packed=True
            )
            return out, pool

        args = (pool, q, k_new, v_new)
    else:
        kp = jnp.asarray(kf, jnp.bfloat16)
        vp = jnp.asarray(vf, jnp.bfloat16)

        @jax.jit
        def fused(kp, vp, q, k_new, v_new):
            out, ko, vo = paged_decode_attention_fused(
                q, kp, vp, k_new, v_new, slots, pt, cl, S, scale
            )
            return out, ko, vo

        @jax.jit
        def separate(kp, vp, q, k_new, v_new):
            if Hkv % 8 == 0 and D % 128 == 0:
                kp, vp = paged_write_rows(kp, vp, k_new, v_new, slots, S)
            else:
                kp, vp = write_rows_2d_pair(kp, vp, k_new, v_new, slots, S)
            out = paged_decode_attention(q, kp, vp, pt, cl, S, scale)
            return out, kp, vp

        args = (kp, vp, q, k_new, v_new)

    try:
        got = fused(*args)
        jax.block_until_ready(got)
    except Exception as e:
        print(f"{name:40s} FUSED COMPILE FAIL: {str(e)[:200]}")
        return
    want = separate(*args)
    jax.block_until_ready(want)

    errs = [
        float(jnp.max(jnp.abs(g.astype(jnp.float32) - w.astype(jnp.float32))))
        for g, w in zip(got, want)
    ]

    def bench(f, args):
        N = 20
        r = f(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(N):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / N * 1000

    t_f = bench(fused, args)
    t_s = bench(separate, args)
    print(
        f"{name:40s} out_err={errs[0]:.4f} pool_err={max(errs[1:]):.4f}  "
        f"fused {t_f:7.3f} ms  separate {t_s:7.3f} ms"
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check("minicpm MHA36 D64 packed", 36, 36, 64, packed=True)
    check("llama8b GQA32/8 D128 split", 32, 8, 128, packed=False)
    check("qwen2-7b GQA28/4 D128 split", 28, 4, 128, packed=False)
