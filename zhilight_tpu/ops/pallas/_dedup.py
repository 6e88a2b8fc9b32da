"""Share one trace + Mosaic lowering across identical per-layer kernel calls.

A model forward calls the same Pallas entry point once per layer (and the
decode-window program once per layer per step): N structurally identical
pallas_calls. Pallas lowering runs locally in Python (jaxpr -> Mosaic MLIR)
and is expensive — ~18 s for the window flush kernel alone on a 1-core host —
and, unlike XLA compilation, is NOT deduplicated across identical call sites:
each pallas_call eqn carries its own freshly traced kernel jaxpr, so the
lowering cache (jax mlir._cached_lowering, keyed on jaxpr identity) always
misses. A 40-layer decode-window program took >10 minutes to build.

Routing every call through ONE module-level jax.jit fixes this: jax's trace
cache (function identity + static args + avals) returns the same ClosedJaxpr
for every layer, the outer trace emits N pjit eqns sharing that jaxpr, and
the lowering cache collapses them to a single Pallas lowering (measured 65x:
10 flush lowerings 180 s -> 2.8 s). XLA later inlines the calls, so runtime
HLO — including the kernels' input_output_aliases on the KV pools — is
unchanged.
"""

from __future__ import annotations

import inspect

import jax

__all__ = ["dedup_jit"]


def dedup_jit(n_array_args: int):
    """Wrap a Pallas entry point whose first ``n_array_args`` parameters are
    arrays and whose remaining parameters are compile-time constants (ints,
    floats, bools). Trailing args stay static whether passed positionally or
    by keyword."""

    def wrap(fn):
        params = list(inspect.signature(fn).parameters)
        static = params[n_array_args:]
        return jax.jit(
            fn,
            static_argnums=tuple(range(n_array_args, len(params))),
            static_argnames=tuple(static),
        )

    return wrap
