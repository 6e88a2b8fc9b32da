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


def _w4a16_packed_kernel(
    x_lo_ref,  # [TM, TKh]  activations for the low-nibble rows
    x_hi_ref,  # [TM, TKh]  activations for the high-nibble rows (k + K/2)
    xs_ref,    # [TM, G] f32: per-group activation sums (precomputed in XLA)
    w_ref,     # [TKh, TN] uint8: two nibble planes
    s_ref,     # [G, TN] f32
    sz_ref,    # [G, TN] f32: scale * zero (precomputed in XLA)
    o_ref,     # [TM, TN]
    acc_ref,   # [TM, TN] f32
    *,
    group_size: int,
    k_steps: int,
    k_half_groups: int,  # group-row offset of the high plane (K/2 // gs)
):
    """Zero-cast dequant: nibble planes are fed to the MXU AS INT8 via two
    masks + bitcasts — no widening, no float casts, no per-weight arithmetic:

      lo   = bitcast_i8(w & 0x0F)  -> raw nibble value 0..15
      hi16 = bitcast_i8(w & 0xF0)  -> 16 * signed(nibble ^ 8) = 16*(w_q - 8)
                                      (pack_int4 stores the high nibble XOR 8)

    The v5e MXU ingests weight operands at a fixed ~800 bytes/cycle
    independent of dtype (measured at [16,8192]x[8192,29696]: bf16 dense
    0.647 ms = 41 cyc per 128x128 tile; this kernel 0.331 ms = 20 cyc/tile —
    both exactly the byte rate), so int8 operands double decode-GEMM
    throughput. That is the hardware ceiling for sub-byte weights on v5e:
    Mosaic legalizes int4 vectors through int8 (measured equal), so Marlin's
    3.5-4x (native s4 tensor-core fragments, gptq_marlin.cu) is not reachable
    — 2x is speed-of-light here, and this kernel runs at ~94% of it.

    Group dequant algebra stays off the per-weight path: per group
    acc += (x_g @ wq_g) * s_eff_g where s_eff folds the hi plane's 1/16, and
    the zero/offset correction over ALL groups is one MXU matmul xs @ sz_eff
    at accumulator init."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        # full zero correction for every group at once: [TM, G] @ [G, TN]
        acc_ref[...] = -jax.lax.dot(
            xs_ref[...], sz_ref[...], preferred_element_type=jnp.float32
        )

    TKh, TN = w_ref.shape
    gpb = TKh // group_size
    w8 = w_ref[...]
    lo = pltpu.bitcast(w8 & 0x0F, jnp.int8)
    hi = pltpu.bitcast(w8 & 0xF0, jnp.int8)
    for wq, x_ref, grow0 in ((lo, x_lo_ref, 0), (hi, x_hi_ref, k_half_groups)):
        for g in range(gpb):
            row = grow0 + k * gpb + g
            pdot = jax.lax.dot_general(
                x_ref[:, g * group_size : (g + 1) * group_size],
                wq[g * group_size : (g + 1) * group_size, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TM, TN] mixed bf16 x int8 MXU dot
            acc_ref[...] += pdot * s_ref[row, :][None, :]

    @pl.when(k == k_steps - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _w4a16_packed(x2, w_packed, scales, zeros, interpret):
    """Fused matmul over GLOBAL-PLANAR packed nibbles (quant.pack_int4):
    packed row r holds original rows r (low nibble) and r + K/2 (high,
    stored XOR 8), so each packed k-tile pairs with TWO activation blocks —
    4 bits/weight of HBM traffic, no in-VMEM interleave."""
    Kh, N = w_packed.shape
    K = 2 * Kh
    G = scales.shape[0]
    gs = K // G
    M = x2.shape[0]
    TM = min(max(8, M), 256)

    # widest N tile VMEM affords: the weight block [TKh, TN] fetches TN-byte
    # row chunks, so wider tiles mean longer contiguous DMA spans (full-row
    # blocks are one contiguous TKh*N span) — same policy as quant_ragged.
    # The stack model matches Mosaic's allocator (verified against two OOM
    # reports at [8192, 29696]: TN=N est 25.7M vs reported 24.5M, TN=N/2
    # est 20.4M vs 19.95M): a block is double-buffered iff its index map
    # actually varies over the grid, single-buffered when constant.
    m_steps = max(1, -(-M // TM))

    def _stack_bytes(TKh, TN):
        k_steps = Kh // TKh
        n_steps = N // TN
        bk = 2 if k_steps * m_steps > 1 else 1   # x blocks (vary with m, k)
        bw = 2 if k_steps > 1 else 1             # w nibble planes
        bn = 2 if n_steps > 1 else 1             # s/sz rows (vary with n)
        bo = 2 if m_steps * n_steps > 1 else 1   # out tile
        return (
            bk * (2 * TM * TKh * 2)              # x lo + hi
            + (2 if m_steps > 1 else 1) * TM * G * 4  # x group sums
            + bw * TKh * TN                      # w nibble planes
            + bn * 2 * G * TN * 4                # s + sz full-G rows
            + bo * TM * TN * 2                   # out tile
            + TM * TN * 4                        # f32 accumulator scratch
        )

    TKh_max = gs
    while TKh_max < 1024 and Kh % (TKh_max * 2) == 0:
        TKh_max *= 2
    _VMEM_BUDGET = 13 << 20  # Mosaic scoped-vmem limit is 16M; leave headroom
    TKh, TN = gs, 128
    for tn in (N, N // 2, N // 4, N // 8, 4096, 2048, 1024, 512, 256, 128):
        if not (128 <= tn <= N and N % tn == 0 and tn % 128 == 0):
            continue
        # large k-tiles amortize per-program overhead (~290 ns measured on
        # v5e); the kernel is MXU-ingest-bound, so bigger tiles are pure win
        tkh = TKh_max
        while tkh > gs and _stack_bytes(tkh, tn) > _VMEM_BUDGET:
            tkh //= 2
        if _stack_bytes(tkh, tn) <= _VMEM_BUDGET:
            TKh, TN = tkh, tn
            break
    Mp = (M + TM - 1) // TM * TM
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    k_steps = Kh // TKh

    if x2.dtype != jnp.bfloat16:
        x2 = x2.astype(jnp.bfloat16)  # mixed MXU dot wants bf16 x int8

    # per-group activation sums for the kernel's zero correction, plus the
    # EFFECTIVE scale rows: the high plane's int8 values carry a factor 16
    # and an offset of 8 quant steps (stored ^8), folded here (XLA-side:
    # O(M*K) + O(G*N), off the hot VPU path)
    xs = jnp.sum(x2.reshape(Mp, G, gs).astype(jnp.float32), axis=-1)  # [Mp, G]
    gh = Kh // gs  # first group row of the high plane
    s_hi = scales[gh:]
    sz = jnp.concatenate(
        [scales[:gh] * zeros[:gh], s_hi * (zeros[gh:] - 8.0)], axis=0
    )
    scales = jnp.concatenate([scales[:gh], s_hi * (1.0 / 16.0)], axis=0)

    out = pl.pallas_call(
        functools.partial(
            _w4a16_packed_kernel,
            group_size=gs,
            k_steps=k_steps,
            k_half_groups=Kh // gs,
        ),
        grid=(N // TN, Mp // TM, k_steps),
        in_specs=[
            pl.BlockSpec((TM, TKh), lambda n, m, k: (m, k)),           # x lo
            pl.BlockSpec((TM, TKh), lambda n, m, k: (m, k)),           # x hi
            pl.BlockSpec((TM, G), lambda n, m, k: (m, 0)),             # x sums
            pl.BlockSpec((TKh, TN), lambda n, m, k: (k, n)),
            pl.BlockSpec((G, TN), lambda n, m, k: (0, n)),
            pl.BlockSpec((G, TN), lambda n, m, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x2.dtype),
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
    )(x2[:, :Kh], x2[:, Kh:], xs, w_packed, scales, sz)
    return out[:M] if Mp != M else out


def w4a16_matmul(
    x: jax.Array,  # [..., K]
    w_p: jax.Array,  # [K, N] int8 nibbles 0..15, or uint8 [K/2, N] packed
    scales: jax.Array,  # [G, N] f32
    zeros: jax.Array,  # [G, N] f32
    interpret: bool = False,
) -> jax.Array:
    orig_shape = x.shape
    packed = w_p.dtype == jnp.uint8
    K, N = (2 * w_p.shape[0], w_p.shape[1]) if packed else w_p.shape
    G = scales.shape[0]
    gs = K // G
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # fallback when shapes don't tile cleanly
    if K % gs or gs % 32 or N % 128 or K % 128 or (packed and (K // 2) % gs):
        from ..quant import dequant_int4

        w = dequant_int4(w_p, scales, zeros, x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    if packed:
        out = _w4a16_packed(x2, w_p, scales, zeros, interpret)
        return out.astype(x.dtype).reshape(orig_shape[:-1] + (N,))

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
