"""Probe: can Mosaic load int4 (packed) weight tiles in a Pallas kernel?"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import zhilight_tpu  # noqa: F401  (applies cache config)
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, dtype, K=256, N=256):
    wq = np.random.RandomState(0).randint(-7, 8, size=(K, N)).astype(np.int8)

    def kernel(w_ref, o_ref):
        o_ref[...] = w_ref[...].astype(jnp.float32)

    try:
        w = jnp.asarray(wq, dtype)
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((K, N), lambda: (0, 0))],
            out_specs=pl.BlockSpec((K, N), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        )(w)
        ok = bool(np.array_equal(np.asarray(out), wq.astype(np.float32)))
        print(f"{name:30s} OK correct={ok}", flush=True)
    except Exception as e:
        print(f"{name:30s} FAIL {str(e)[:140]}", flush=True)


def probe_dot(name, dtype, K=256, N=256, M=64):
    rng = np.random.RandomState(1)
    wq = rng.randint(-7, 8, size=(K, N)).astype(np.int8)
    x = rng.randn(M, K).astype(np.float32)

    def kernel(x_ref, w_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot(
            x_ref[...], w, preferred_element_type=jnp.float32
        )

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((M, K), lambda: (0, 0)),
                pl.BlockSpec((K, N), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(jnp.asarray(x, jnp.bfloat16), jnp.asarray(wq, dtype))
        want = x.astype(np.float32) @ wq.astype(np.float32)
        err = float(np.max(np.abs(np.asarray(out) - want)) / (np.abs(want).max() + 1e-9))
        print(f"{name:30s} OK rel_err={err:.4f}", flush=True)
    except Exception as e:
        print(f"{name:30s} FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("int4 load+convert", jnp.int4)
    probe("int8 load+convert", jnp.int8)
    probe_dot("int4 dequant-dot", jnp.int4)
    probe_dot("int8 dequant-dot", jnp.int8)
