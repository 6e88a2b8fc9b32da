"""Probe which DMA slice patterns Mosaic accepts on this TPU."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, rows_shape, cache_shape, src_space, row_idx=3, slot=17):
    def kernel(rows, cache_in, cache_out, sem):
        del cache_in
        pltpu.make_async_copy(rows.at[row_idx], cache_out.at[slot], sem).start()
        pltpu.make_async_copy(rows.at[row_idx], cache_out.at[slot], sem).wait()

    rows = jnp.ones(rows_shape, jnp.bfloat16)
    cache = jnp.zeros(cache_shape, jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=src_space),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(cache_shape, jnp.bfloat16),
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rows, cache)
        out.block_until_ready()
        ok = bool(np.all(np.asarray(out[slot]) == 1))
        print(f"{name:55s} OK correct={ok}")
    except Exception as e:
        print(f"{name:55s} FAIL {str(e)[:80]}")


def probe_page(name, rows_shape, cache_shape, src_space, S=16):
    def kernel(rows, cache_in, cache_out, sem):
        del cache_in
        pltpu.make_async_copy(rows.at[pl.ds(16, S)], cache_out.at[pl.ds(32, S)], sem).start()
        pltpu.make_async_copy(rows.at[pl.ds(16, S)], cache_out.at[pl.ds(32, S)], sem).wait()

    rows = jnp.ones(rows_shape, jnp.bfloat16)
    cache = jnp.zeros(cache_shape, jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=src_space),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(cache_shape, jnp.bfloat16),
            input_output_aliases={1: 0},
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rows, cache)
        out.block_until_ready()
        ok = bool(np.all(np.asarray(out[32:48]) == 1))
        print(f"{name:55s} OK correct={ok}")
    except Exception as e:
        print(f"{name:55s} FAIL {str(e)[:80]}")


if __name__ == "__main__":
    ANY = pl.ANY
    # per-row DMA, 3-D aligned
    probe("row3d H8 D128 src=ANY", (16, 8, 128), (256, 8, 128), ANY)
    # per-row DMA, 3-D unaligned
    probe("row3d H36 D64 src=ANY", (16, 36, 64), (256, 36, 64), ANY)
    # per-row DMA 2-D flattened
    probe("row2d X2304 src=ANY", (16, 2304), (256, 2304), ANY)
    probe("row2d X576 src=ANY", (16, 576), (256, 576), ANY)
    # page-run DMA
    probe_page("page3d H8 D128 src=ANY", (64, 8, 128), (256, 8, 128), ANY)
    probe_page("page3d H36 D64 src=ANY", (64, 36, 64), (256, 36, 64), ANY)
    probe_page("page2d X2304 src=ANY", (64, 2304), (256, 2304), ANY)
    # Hkv=1 squeezed
    probe("row3d H1 D128 src=ANY", (16, 1, 128), (256, 1, 128), ANY)
