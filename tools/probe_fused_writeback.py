"""Probe: which VMEM->HBM page write-back shapes does Mosaic accept?

Bisects the packed fused-kernel compile failure (Hkv=36): full-VMEM-buffer
[S, H, D] -> HBM 3-D page slice, for various H."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16


def probe_pagewrite(name, H, D, dst_off=None):
    """VMEM scratch [S, H, D] (filled in-kernel) -> cache.at[pl.ds(dyn, S)]."""

    def kernel(slots_ref, cache_in, cache_out, buf, sem):
        del cache_in
        buf[...] = jnp.ones_like(buf)
        dst = (slots_ref[0] // S) * S
        if dst_off is None:
            cp = pltpu.make_async_copy(buf, cache_out.at[pl.ds(dst, S)], sem)
            cp.start()
            cp.wait()
        else:
            # split the sublane dim into two statically-offset chunks
            h0 = dst_off
            cp = pltpu.make_async_copy(
                buf.at[:, pl.ds(0, h0)], cache_out.at[pl.ds(dst, S), pl.ds(0, h0)], sem
            )
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(
                buf.at[:, pl.ds(h0, H - h0)],
                cache_out.at[pl.ds(dst, S), pl.ds(h0, H - h0)],
                sem,
            )
            cp.start()
            cp.wait()

    cache = jnp.zeros((64 * S, H, D), jnp.bfloat16)
    slots = jnp.asarray([32 * S + 3], jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((S, H, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(cache.shape, jnp.bfloat16),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(slots, cache)
        out.block_until_ready()
        got = np.asarray(out[32 * S : 33 * S])
        ok = bool(np.all(got == 1)) and bool(np.all(np.asarray(out[: 32 * S]) == 0))
        print(f"{name:58s} OK correct={ok}", flush=True)
    except Exception as e:
        print(f"{name:58s} FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe_pagewrite("H=8  D=128 whole-buffer", 8, 128)
    probe_pagewrite("H=4  D=128 whole-buffer", 4, 128)
    probe_pagewrite("H=36 D=128 whole-buffer", 36, 128)
    probe_pagewrite("H=32 D=128 whole-buffer", 32, 128)
    probe_pagewrite("H=40 D=128 whole-buffer", 40, 128)
    probe_pagewrite("H=36 D=128 split 32+4", 36, 128, dst_off=32)
    probe_pagewrite("H=36 D=64  whole-buffer", 36, 64)
