"""On-chip A/B: head-major packed decode kernel vs slot-major packed kernel.

MiniCPM geometry (36 MHA heads, D=64 packed) and a GQA geometry; honest
timing via repeated calls + one final block, plus correctness vs the XLA
reference on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import jax

import numpy as np
import jax.numpy as jnp

from zhilight_tpu.ops.attention import decode_attention
from zhilight_tpu.ops.pallas.attn_headmajor import paged_decode_attention_hm
from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention


def run(name, Hq, Hkv, D, B=16, CTX=512, S=16):
    MAXP = CTX // S
    P = B * MAXP
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.bfloat16)
    kf = rng.randn(P * S, Hkv, D).astype(np.float32)
    vf = rng.randn(P * S, Hkv, D).astype(np.float32)
    pt = jnp.asarray(np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32))
    cl_np = rng.randint(CTX // 2, CTX, size=B).astype(np.int32)
    cl = jnp.asarray(cl_np)
    scale = 1.0 / np.sqrt(D)

    pool_sm = jnp.asarray(np.concatenate([kf, vf], axis=-1), jnp.bfloat16)  # [N, H, 2D]
    pool_hm = jnp.asarray(
        np.concatenate([kf, vf], axis=-1).transpose(1, 0, 2), jnp.bfloat16
    )  # [H, N, 2D]

    f_sm = jax.jit(lambda q, p: paged_decode_attention(
        q, p, p, pt, cl, S, scale, packed=True))
    f_hm = jax.jit(lambda q, p: paged_decode_attention_hm(
        q, p, pt, cl, S, scale))

    try:
        a = f_sm(q, pool_sm); a.block_until_ready()
    except Exception as e:
        print(f"{name} slot-major FAIL {str(e)[:120]}"); return
    try:
        b2 = f_hm(q, pool_hm); b2.block_until_ready()
    except Exception as e:
        print(f"{name} head-major FAIL {str(e)[:120]}"); return

    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b2.astype(jnp.float32))))

    def bench(f, *args):
        N = 50
        r = f(*args); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(N):
            r = f(*args)
        r.block_until_ready()
        return (time.perf_counter() - t0) / N * 1000

    t_sm = bench(f_sm, q, pool_sm)
    t_hm = bench(f_hm, q, pool_hm)
    kv_bytes = float(np.sum(np.minimum(cl_np + S, MAXP * S))) * Hkv * 2 * D * 2
    roof = kv_bytes / 819e9 * 1000
    print(
        f"{name:28s} err={err:.4f}  slot-major {t_sm:7.3f} ms  "
        f"head-major {t_hm:7.3f} ms  (roofline ~{roof:.3f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("minicpm MHA36 D64", 36, 36, 64)
    run("llama8b GQA32/8 D64-packed", 32, 8, 64)
