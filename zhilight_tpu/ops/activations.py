"""Activation functions + fused gate-activation (reference ff_kernel.cu fused
gate-activation x up kernel — on TPU XLA fuses silu(g)*u into the surrounding
matmuls automatically)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["get_activation", "gated_act"]

_ACTS = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}


def get_activation(name: str):
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(f"unsupported activation: {name!r}") from None


def gated_act(gate: jax.Array, up: jax.Array, act: str = "silu") -> jax.Array:
    return get_activation(act)(gate) * up
