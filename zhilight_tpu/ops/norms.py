"""Normalization ops.

Parity: reference ``nn::LayerNorm`` fused RMS/LayerNorm kernels
(src/nn/layernorm/layernorm.cu) — RMSNorm, classic LayerNorm (Cohere),
optional fused residual-add, and per-head QK-norm. All reductions accumulate
in fp32 (the reference HIGH_PRECISION behavior) and XLA fuses these into
surrounding ops, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "add_rms_norm", "qk_norm"]


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Non-RMS LayerNorm without bias (Cohere style, reference layernorm.cu rms=false)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def add_rms_norm(x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6):
    """Fused residual-add + RMSNorm (reference add_fuse_ln, block_kernel.cu).

    Returns (normed, new_residual).
    """
    new_res = x + residual
    return rms_norm(new_res, weight, eps), new_res


def qk_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-head RMS norm over head_dim (Qwen3 q_norm/k_norm).

    x: [..., num_heads, head_dim]; weight: [head_dim].
    """
    return rms_norm(x, weight, eps)
