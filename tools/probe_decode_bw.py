"""What binds the decode attention kernel: DMA shape or the M=1 dots?

Measures, at the MiniCPM bench geometry (36 MHA heads, D=64, B=16, ctx 512,
page 16), effective HBM GB/s of:

  full     — the production head-major kernel (dots + softmax)
  dma      — same grid/BlockSpecs, body reduced to a VPU accumulate
             (isolates the fetch path: strided [Hkv, S, 2D] blocks)
  dma-pm   — page-major pool [P, Hkv, S, 2D]: one CONTIGUOUS block per page
  full-pm  — page-major pool + the real dots/softmax body

Run on the real chip: python tools/probe_decode_bw.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e38


def make_inputs(B, Hq, Hkv, D, CTX, S, layers, extra_pages=2):
    MAXP = CTX // S + extra_pages  # headroom pages like serving tables
    P = B * MAXP
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hq, D), jnp.bfloat16)
    pt = jnp.asarray(
        np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32)
    )
    cl = jnp.full((B,), CTX, jnp.int32)
    pools_hm = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (Hkv, P * S, 2 * D), jnp.bfloat16)
        for i in range(layers)
    )
    pools_pm = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (P, Hkv, S, 2 * D), jnp.bfloat16)
        for i in range(layers)
    )
    return q, pt, cl, pools_hm, pools_pm, MAXP


def dma_probe_hm(q, pool, pt, cl, S, fetch_pages=8):
    """Current BlockSpec fetch pattern, compute stripped to a VPU add."""
    B, Hq, D = q.shape
    Hkv, N, D2 = pool.shape
    maxp = pt.shape[1]
    FPB = min(fetch_pages, maxp)
    nb = (maxp + FPB - 1) // FPB
    FPB = (maxp + nb - 1) // nb

    def kern(pt_ref, cl_ref, *refs):
        kv_refs = refs[:FPB]
        o_ref, acc = refs[FPB], refs[FPB + 1]
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        for r in kv_refs:
            acc[...] += r[:, :8, :].astype(jnp.float32)

        @pl.when(i == nb - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def kv_index_at(j):
        def kv_index(b, i, pt_ref, cl_ref):
            ctx = cl_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = pt_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (0, page, 0)

        return kv_index

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((Hkv, S, D2), kv_index_at(j)) for j in range(FPB)],
        out_specs=pl.BlockSpec((1, Hkv, 8, D2), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Hkv, 8, D2), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, 8, D2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(pt, cl, *([pool] * FPB))


def dma_probe_pm(q, pool, pt, cl, S, fetch_pages=8):
    """Page-major pool: one contiguous [1, Hkv, S, 2D] block per page."""
    B, Hq, D = q.shape
    P, Hkv, S_, D2 = pool.shape
    maxp = pt.shape[1]
    FPB = min(fetch_pages, maxp)
    nb = (maxp + FPB - 1) // FPB
    FPB = (maxp + nb - 1) // nb

    def kern(pt_ref, cl_ref, *refs):
        kv_refs = refs[:FPB]
        o_ref, acc = refs[FPB], refs[FPB + 1]
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        for r in kv_refs:
            acc[...] += r[0, :, :8, :].astype(jnp.float32)

        @pl.when(i == nb - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def kv_index_at(j):
        def kv_index(b, i, pt_ref, cl_ref):
            ctx = cl_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = pt_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0, 0, 0)

        return kv_index

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, Hkv, S, D2), kv_index_at(j)) for j in range(FPB)],
        out_specs=pl.BlockSpec((1, Hkv, 8, D2), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Hkv, 8, D2), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, 8, D2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(pt, cl, *([pool] * FPB))


def full_pm(q, pool, pt, cl, S, scale, fetch_pages=8):
    """Real flash body on the page-major pool (contiguous page blocks)."""
    B, Hq, D = q.shape
    P, Hkv, S_, D2 = pool.shape
    G = Hq // Hkv
    maxp = pt.shape[1]
    FPB = min(fetch_pages, maxp)
    nb = (maxp + FPB - 1) // FPB
    FPB = (maxp + nb - 1) // nb

    def kern(pt_ref, cl_ref, *refs):
        q_ref = refs[0]
        kv_refs = refs[1 : 1 + FPB]
        o_ref, m_ref, l_ref, acc_ref = refs[1 + FPB :]
        b = pl.program_id(0)
        i = pl.program_id(1)
        ctx = cl_ref[b]

        @pl.when(i == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nvalid = pl.cdiv(ctx, S)

        @pl.when((i * FPB) < nvalid)
        def _():
            q = q_ref[0]
            # [FPB, Hkv, S, D2] -> [Hkv, FPB*S, D2]
            kv = jnp.concatenate([r[0] for r in kv_refs], axis=1)
            s = jax.lax.dot_general(
                q, kv, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            token_idx = i * (FPB * S) + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=2
            )
            s = jnp.where(token_idx < ctx, s, NEG_INF)
            m_prev = m_ref[...]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            upd = jax.lax.dot_general(
                p.astype(kv.dtype), kv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + upd
            m_ref[...] = m_new

        @pl.when(i == nb - 1)
        def _():
            l = jnp.maximum(l_ref[...], 1e-20)
            o_ref[0] = ((acc_ref[...] / l)[..., D:]).astype(o_ref.dtype)

    q_g = jnp.pad(q.reshape(B, Hkv, G, D), ((0, 0), (0, 0), (0, 0), (0, D2 - D)))

    def kv_index_at(j):
        def kv_index(b, i, pt_ref, cl_ref):
            ctx = cl_ref[b]
            valid = pl.cdiv(ctx, S)
            pos = i * FPB + j
            page = pt_ref[b, jnp.minimum(pos, jnp.maximum(valid - 1, 0))]
            return (page, 0, 0, 0)

        return kv_index

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, Hkv, G, D2), lambda b, i, *_: (b, 0, 0, 0))]
        + [pl.BlockSpec((1, Hkv, S, D2), kv_index_at(j)) for j in range(FPB)],
        out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, 1), jnp.float32),
            pltpu.VMEM((Hkv, G, D2), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(pt, cl, q_g, *([pool] * FPB))


def bench(f, *args, iters=30):
    # block_until_ready is async-ish on the axon tunnel; a host fetch of the
    # reduced scalar is the only reliable fence
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def main():
    from zhilight_tpu.ops.pallas.attn_headmajor import paged_decode_attention_hm

    B, Hq, Hkv, D, CTX, S = 16, 36, 36, 64, 512, 16
    layers = 40
    scale = 1.0 / np.sqrt(D)
    q, pt, cl, pools_hm, pools_pm, MAXP = make_inputs(B, Hq, Hkv, D, CTX, S, layers)
    valid_pages = CTX // S
    bytes_valid = layers * B * valid_pages * S * Hkv * 2 * D * 2  # valid KV only
    print(f"geometry: B={B} Hkv={Hkv} D={D} ctx={CTX} S={S} maxp={MAXP} "
          f"valid KV/step={bytes_valid / 1e9:.2f} GB over {layers} layers")

    def mk(fn, pools, **kw):
        @jax.jit
        def run(q, pools, pt, cl):
            outs = [fn(q, p, pt, cl, S, **kw) for p in pools]
            return sum(o.astype(jnp.float32).sum() for o in outs)
        return functools.partial(run, q, pools, pt, cl)

    variants = [
        ("full(current)", mk(
            lambda q, p, pt, cl, S, **kw: paged_decode_attention_hm(
                q, p, pt, cl, S, scale, **kw), pools_hm)),
        ("dma-hm", mk(dma_probe_hm, pools_hm)),
        ("dma-pm", mk(dma_probe_pm, pools_pm)),
    ]
    for fp in (8, 16, 34):
        variants.append((f"dma-pm fp={fp}", mk(
            functools.partial(dma_probe_pm, fetch_pages=fp), pools_pm)))
        variants.append((f"dma-hm fp={fp}", mk(
            functools.partial(dma_probe_hm, fetch_pages=fp), pools_hm)))
        variants.append((f"full-pm fp={fp}", mk(
            functools.partial(full_pm, scale=scale, fetch_pages=fp), pools_pm)))
        variants.append((f"full-hm fp={fp}", mk(
            lambda q, p, pt, cl, S, fp=fp: paged_decode_attention_hm(
                q, p, pt, cl, S, scale, fetch_pages=fp), pools_hm)))

    for name, f in variants:
        try:
            dt = bench(f)
        except Exception as e:
            print(f"{name:18s} FAIL {str(e)[:140]}")
            continue
        print(f"{name:18s} {dt * 1e3:8.3f} ms  -> {bytes_valid / dt / 1e9:6.1f} GB/s (valid bytes)")


if __name__ == "__main__":
    main()
