"""Pallas TPU kernel: fused dequant + GROUPED (ragged) matmul for
weight-only-quantized MoE expert stacks.

TPU-native replacement for the reference's quantized grouped GEMMs —
GPTQMOE (FUSE_GPTQ_MOE) and FP8BlockMOE/DeepGEMM
(src/nn/feedforward/feedforward.cpp:967-1075, 3rd/deep_gemm): tokens routed
to E experts multiply each expert's int4 weights WITHOUT materializing a
bf16 [E, K, N] stack in HBM (models/moe.py previously vmap-dequantized whole
stacks per forward — 4x the HBM bytes quantization should save).

Design (megablox/gmm-style group tiling, quantization fused per-tile):
  * rows are laid out GROUP-ALIGNED: each expert's tokens start at a
    TM-aligned row (``ragged_layout``), so every [TM, K] m-tile belongs to
    exactly one expert and a scalar-prefetched ``tile_expert`` array drives
    the weight BlockSpec — the kernel visits ONLY experts that own tokens
    (decode reads just the routed experts' bytes, like the reference's
    grouped GEMM over occupied groups).
  * grid (n, m, k): m-tiles of one expert are consecutive, so Pallas'
    revisiting skips the weight re-DMA between them — each active expert's
    weights stream from HBM exactly once per n-tile at 4 bits/weight.
  * dequantization is the planar zero-cast trick of
    pallas/quant_matmul._w4a16_packed_kernel: two nibble planes feed the MXU
    as int8 via mask+bitcast, group scales fold per-group after the dot, and
    the zero correction over all groups is one MXU matmul at accumulator
    init.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["w4a16_ragged_matmul", "ragged_layout", "pack_expert_int4"]


def pack_expert_int4(w_nib: jax.Array) -> jax.Array:
    """Per-expert planar pack: int8 nibble stack [E, K, N] -> uint8
    [E, K/2, N]. Within each expert the layout matches ops.quant.pack_int4
    (low nibbles rows [0, K/2), high nibbles rows [K/2, K) stored XOR 8)."""
    K = w_nib.shape[1]
    lo = w_nib[:, : K // 2].astype(jnp.uint8)
    hi = w_nib[:, K // 2 :].astype(jnp.uint8) ^ 8
    return lo | (hi << 4)


def ragged_layout(flat_experts: jax.Array, num_experts: int, tm: int,
                  occ_experts: int = 0):
    """Group-aligned padded row layout for ``w4a16_ragged_matmul``.

    flat_experts: [R] expert id per (token, k) pair, unsorted.
    Returns (sort_idx [R], dest [R], tile_expert [Mp//tm], num_occ [1], Mp)
    where ``dest[i]`` is the padded-row position of sorted row i (rows sorted
    by expert), every expert's rows start tm-aligned, ``tile_expert`` names
    each m-tile's expert, and ``num_occ`` is the dynamic count of OCCUPIED
    m-tiles — occupied tiles are a prefix, so the kernel skips compute and
    freezes DMAs for tiles >= num_occ (the static grid is the worst case
    Mp = R + E*(tm-1); with many experts and few rows most tiles are
    padding). Mp is that static bound rounded up to tm.

    ``occ_experts`` (if non-zero) counts only the first ``occ_experts``
    groups toward ``num_occ`` and caps ``tile_expert`` there: expert-parallel
    shards route remote-expert rows into trailing OVERFLOW buckets that must
    never be computed nor indexed into the local [E_local, ...] weight
    stacks (their output rows stay unwritten; callers mask them)."""
    R = flat_experts.shape[0]
    E = num_experts
    mp = ((R + E * (tm - 1)) + tm - 1) // tm * tm
    sizes = jnp.bincount(flat_experts, length=E)
    padded = (sizes + tm - 1) // tm * tm
    p_ends = jnp.cumsum(padded)
    p_starts = p_ends - padded
    starts = jnp.cumsum(sizes) - sizes
    sort_idx = jnp.argsort(flat_experts, stable=True)
    es = flat_experts[sort_idx]
    rank = jnp.arange(R) - starts[es]
    dest = p_starts[es] + rank
    tile_starts = jnp.arange(mp // tm, dtype=jnp.int32) * tm
    cap = (occ_experts or E) - 1
    tile_expert = jnp.clip(
        jnp.searchsorted(p_ends, tile_starts, side="right"), 0, cap
    ).astype(jnp.int32)
    occ_end = p_ends[occ_experts - 1] if occ_experts else p_ends[-1]
    num_occ = (occ_end // tm).astype(jnp.int32).reshape(1)
    return sort_idx, dest, tile_expert, num_occ, mp


def _kernel_ragged_w4(
    te_ref,      # [num_m_tiles] int32 tile -> expert (SMEM scalar prefetch)
    occ_ref,     # [1] int32 occupied m-tile count (SMEM scalar prefetch)
    x_lo_ref,    # [TM, TKh]
    x_hi_ref,    # [TM, TKh]
    xs_ref,      # [TM, G] f32 per-group activation sums
    w_ref,       # [1, TKh, TN] uint8 nibble planes of this tile's expert
    s_ref,       # [1, G, TN] f32 effective scales
    sz_ref,      # [1, G, TN] f32 scale*zero (hi plane offset folded)
    o_ref,       # [TM, TN]
    acc_ref,     # [TM, TN] f32
    *,
    group_size: int,
    k_steps: int,
    k_half_groups: int,
):
    k = pl.program_id(2)

    # tiles past the occupied prefix carry no rows: their DMAs are frozen to
    # the last occupied tile's blocks (index maps below) and the whole body
    # is skipped — the worst-case grid costs ~nothing when few experts own
    # tokens (decode on many-expert models)
    @pl.when(pl.program_id(1) < occ_ref[0])
    def _active():
        @pl.when(k == 0)
        def _init():
            acc_ref[...] = -jax.lax.dot(
                xs_ref[...], sz_ref[0], preferred_element_type=jnp.float32
            )

        TKh = w_ref.shape[1]
        gpb = TKh // group_size
        w8 = w_ref[0]
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
                )
                acc_ref[...] += pdot * s_ref[0, row, :][None, :]

        @pl.when(k == k_steps - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def w4a16_ragged_matmul(
    x: jax.Array,            # [Mp, K] bf16, GROUP-ALIGNED rows (ragged_layout)
    w_p: jax.Array,          # [E, K/2, N] uint8 per-expert planar packed
    scales: jax.Array,       # [E, G, N] f32
    zeros: jax.Array,        # [E, G, N] f32
    tile_expert: jax.Array,  # [Mp//TM] int32 expert of each m-tile
    num_occ: jax.Array,      # [1] int32 occupied m-tile count (ragged_layout)
    interpret: bool = False,
) -> jax.Array:
    """Grouped W4A16 matmul over group-aligned rows; returns [Mp, N].
    Output rows in tiles >= num_occ are unwritten garbage the caller must
    not read (ragged_layout's dest indices never point there)."""
    Mp, K = x.shape
    E, Kh, N = w_p.shape
    assert K == 2 * Kh, (K, Kh)
    G = scales.shape[1]
    gs = K // G
    num_m_tiles = tile_expert.shape[0]
    TM = Mp // num_m_tiles
    assert Mp % num_m_tiles == 0

    # full-row weight blocks when VMEM affords: a [1, TKh, TN] block with
    # TN < N fetches TN-byte chunks per row (a 128-lane tile of N=1408 moved
    # 128 B at a time — ~450 GB/s effective on the DeepSeek-V2-Lite decode
    # profile); TN = N makes each weight fetch ONE contiguous TKh*N span.
    # Stack model mirrors quant_matmul._stack_bytes, except s/sz are
    # always double-buffered here (their expert index changes per m-tile).
    def _stack_bytes(TKh, TN):
        return (
            2 * (2 * TM * TKh * 2)   # x lo + hi
            + 2 * TM * G * 4         # x group sums
            + 2 * TKh * TN           # w nibble planes
            + 2 * 2 * G * TN * 4     # s + sz (expert-varying, double-buffered)
            + 2 * TM * TN * 2        # out tile
            + TM * TN * 4            # f32 accumulator scratch
        )

    TKh_max = gs
    while TKh_max < 1024 and Kh % (TKh_max * 2) == 0:
        TKh_max *= 2
    _VMEM_BUDGET = 13 << 20
    TKh, TN = gs, 128
    for tn in (N, N // 2, N // 4, N // 8, 4096, 2048, 1024, 512, 256, 128):
        if not (128 <= tn <= N and N % tn == 0 and tn % 128 == 0):
            continue
        tkh = TKh_max
        while tkh > gs and _stack_bytes(tkh, tn) > _VMEM_BUDGET:
            tkh //= 2
        if _stack_bytes(tkh, tn) <= _VMEM_BUDGET:
            TKh, TN = tkh, tn
            break
    k_steps = Kh // TKh
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)

    xs = jnp.sum(x.reshape(Mp, G, gs).astype(jnp.float32), axis=-1)  # [Mp, G]
    gh = Kh // gs
    s_hi = scales[:, gh:]
    sz = jnp.concatenate(
        [scales[:, :gh] * zeros[:, :gh], s_hi * (zeros[:, gh:] - 8.0)], axis=1
    )
    s_eff = jnp.concatenate([scales[:, :gh], s_hi * (1.0 / 16.0)], axis=1)

    grid = (N // TN, num_m_tiles, k_steps)

    # tiles past the occupied prefix freeze every index to the last occupied
    # tile's blocks: consecutive grid steps then revisit the same block and
    # Pallas skips the DMA entirely (the kernel also pl.when-skips compute)
    def _mm(m, occ):
        return jnp.minimum(m, jnp.maximum(occ[0] - 1, 0))

    def _kk(m, k, occ):
        return jnp.where(m < occ[0], k, k_steps - 1)

    def w_index(n, m, k, te, occ):
        return (te[_mm(m, occ)], _kk(m, k, occ), n)

    def sz_index(n, m, k, te, occ):
        return (te[_mm(m, occ)], 0, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKh), lambda n, m, k, te, occ: (_mm(m, occ), _kk(m, k, occ))),  # x lo
            pl.BlockSpec((TM, TKh), lambda n, m, k, te, occ: (_mm(m, occ), _kk(m, k, occ))),  # x hi
            pl.BlockSpec((TM, G), lambda n, m, k, te, occ: (_mm(m, occ), 0)),  # x sums
            pl.BlockSpec((1, TKh, TN), w_index),
            pl.BlockSpec((1, G, TN), sz_index),
            pl.BlockSpec((1, G, TN), sz_index),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda n, m, k, te, occ: (_mm(m, occ), n)),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_ragged_w4,
            group_size=gs,
            k_steps=k_steps,
            k_half_groups=Kh // gs,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_expert, jnp.asarray(num_occ, jnp.int32), x[:, :Kh], x[:, Kh:], xs, w_p, s_eff, sz)
    return out
