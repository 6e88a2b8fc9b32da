"""Pallas TPU kernels: fused dequantize + matmul for weight-only quantization.

TPU-native replacement for the reference's CUDA quant GEMMs — exllama q_gemm /
GPTQ k-major / Marlin (src/nn/quant/gptq/, quant/marlin/gptq_marlin.cu) and
AWQ gemv/gemm (src/nn/quant/awq/): the int4 weight tile is DMA'd to VMEM as
nibble-valued int8, dequantized on the VPU ((w - zero) * scale in the group's
granularity), and fed to the MXU in the activation dtype — weights never
round-trip through HBM in bf16, so the GEMM stays weight-bandwidth-bound at
~4 bits/weight.

Grid (n, m, k) with k innermost; fp32 accumulation in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["w4a16_matmul"]


def _w4a16_kernel(
    x_ref,  # [TM, TK]
    w_ref,  # [TK, TN] int8 nibbles
    s_ref,  # [G, TN] f32 (all groups of this N tile)
    z_ref,  # [G, TN] f32
    o_ref,  # [TM, TN]
    acc_ref,  # [TM, TN] f32
    *,
    group_size: int,
    k_steps: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    TK, TN = w_ref.shape
    gpb = TK // group_size  # groups per k-block (static unroll)
    for g in range(gpb):
        row = k * gpb + g
        s = s_ref[row, :]  # [TN]
        z = z_ref[row, :]
        w_q = w_ref[g * group_size : (g + 1) * group_size, :].astype(jnp.float32)
        w = ((w_q - z[None, :]) * s[None, :]).astype(x_ref.dtype)
        acc_ref[...] += jax.lax.dot(
            x_ref[:, g * group_size : (g + 1) * group_size],
            w,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == k_steps - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_tiles(M, K, N, gs):
    TM = min(max(8, M), 256)
    # TK: multiple of group size and of 32 (int8 sublane), divides K
    TK = gs
    while TK < 256 and K % (TK * 2) == 0:
        TK *= 2
    TN = 256 if N % 256 == 0 else 128
    return TM, TK, TN


def w4a16_matmul(
    x: jax.Array,  # [..., K]
    w_p: jax.Array,  # [K, N] int8 nibbles 0..15
    scales: jax.Array,  # [G, N] f32
    zeros: jax.Array,  # [G, N] f32
    interpret: bool = False,
) -> jax.Array:
    orig_shape = x.shape
    K, N = w_p.shape
    G = scales.shape[0]
    gs = K // G
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # fallback when shapes don't tile cleanly
    if K % gs or gs % 32 or N % 128 or K % 128:
        from ..quant import dequant_int4

        w = dequant_int4(w_p, scales, zeros, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    TM, TK, TN = _pick_tiles(M, K, N, gs)
    Mp = (M + TM - 1) // TM * TM
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    k_steps = K // TK

    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, group_size=gs, k_steps=k_steps),
        grid=(N // TN, Mp // TM, k_steps),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda n, m, k: (m, k)),
            pl.BlockSpec((TK, TN), lambda n, m, k: (k, n)),
            pl.BlockSpec((G, TN), lambda n, m, k: (0, n)),
            pl.BlockSpec((G, TN), lambda n, m, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w_p, scales, zeros)
    if Mp != M:
        out = out[:M]
    return out.reshape(orig_shape[:-1] + (N,))
