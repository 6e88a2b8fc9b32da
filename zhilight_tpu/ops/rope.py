"""Rotary position embeddings — all scaling families of the reference.

Parity: src/nn/position/rotary_embedding.cu (706 LoC) which implements
default, linear, dynamic-NTK, YaRN (incl. DeepSeek mscale variant,
rotary_embedding.cu:518-612), Llama-3 low/high-frequency scaling
(:400-470), neox vs interleaved rotation styles, and the RopePreparer
cos/sin precompute (rope_preparer.cu). Here the frequency table is computed
once at model build (numpy, host) and cos/sin are formed from integer
positions inside jit — the ROPE_CACHE analogue falls out naturally since
XLA hoists the gather.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model_config import RopeConfig

__all__ = ["RopeTable", "build_rope_table", "apply_rope", "apply_rope_rot"]


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base, max_pos):
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(low, high, dim):
    if low == high:
        high += 0.001
    ramp = (np.arange(dim, dtype=np.float64) - low) / (high - low)
    return np.clip(ramp, 0, 1)


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


@dataclass(frozen=True)
class RopeTable:
    """Static rope state: inverse frequencies + attention magnitude scale."""

    inv_freq: np.ndarray  # [dim/2] float64
    mscale: float
    neox_style: bool

    def cos_sin(self, positions: jax.Array, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        """positions [*shape] int32 -> cos/sin [*shape, dim/2]."""
        inv_freq = jnp.asarray(self.inv_freq, dtype=jnp.float32)
        freqs = positions.astype(jnp.float32)[..., None] * inv_freq
        return (
            (jnp.cos(freqs) * self.mscale).astype(dtype),
            (jnp.sin(freqs) * self.mscale).astype(dtype),
        )

    def rot_values(self, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Full-width cos/sin [*shape, dim] for the slice-free rotation path
        (compute ONCE per forward and share across layers: the half-slice /
        concat formulation emitted ~200 async device slices per decode step,
        ~2 ms at 40 layers)."""
        cos, sin = self.cos_sin(positions)
        if self.neox_style:
            return (
                jnp.concatenate([cos, cos], axis=-1),
                jnp.concatenate([sin, sin], axis=-1),
            )
        return jnp.repeat(cos, 2, axis=-1), jnp.repeat(sin, 2, axis=-1)


def build_rope_table(
    dim: int,
    theta: float,
    cfg: RopeConfig,
    max_position_embeddings: int = 8192,
    max_model_len: int = 0,
) -> RopeTable:
    base = float(theta)
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    mscale = 1.0
    rtype = cfg.type or "default"

    if rtype in ("default", ""):
        pass
    elif rtype == "linear":
        inv_freq = inv_freq / cfg.factor
    elif rtype == "dynamic":
        # dynamic NTK evaluated at serving max length (static-shape policy:
        # the reference recomputes per step when seq_len exceeds trained length,
        # rotary_embedding.cu dynamic path; on TPU we fix the worst case)
        seq_len = max(max_model_len or max_position_embeddings, max_position_embeddings)
        if seq_len > max_position_embeddings and cfg.factor > 1.0:
            adj_base = base * (
                (cfg.factor * seq_len / max_position_embeddings) - (cfg.factor - 1)
            ) ** (dim / (dim - 2))
            inv_freq = 1.0 / (adj_base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    elif rtype == "yarn":
        orig_max = cfg.original_max_position or max_position_embeddings
        extrapolation = inv_freq
        interpolation = inv_freq / cfg.factor
        low, high = _yarn_find_correction_range(
            cfg.beta_fast, cfg.beta_slow, dim, base, orig_max
        )
        ramp = 1.0 - _yarn_linear_ramp(low, high, dim // 2)
        inv_freq = interpolation * (1.0 - ramp) + extrapolation * ramp
        if cfg.mscale_all_dim:
            # DeepSeek variant (rotary_embedding.cu:518-612 / HF deepseek_v2)
            mscale = cfg.attn_factor * (
                _yarn_get_mscale(cfg.factor, cfg.mscale)
                / _yarn_get_mscale(cfg.factor, cfg.mscale_all_dim)
            )
        else:
            mscale = cfg.attn_factor * _yarn_get_mscale(cfg.factor, 1.0)
    elif rtype == "llama3":
        low_freq_wavelen = (cfg.original_max_position or max_position_embeddings) / cfg.low_freq_factor
        high_freq_wavelen = (cfg.original_max_position or max_position_embeddings) / cfg.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        scaled = np.where(wavelen > low_freq_wavelen, inv_freq / cfg.factor, inv_freq)
        smooth = (
            (cfg.original_max_position or max_position_embeddings) / wavelen - cfg.low_freq_factor
        ) / (cfg.high_freq_factor - cfg.low_freq_factor)
        mid = (1 - smooth) * inv_freq / cfg.factor + smooth * inv_freq
        is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
        inv_freq = np.where(is_mid, mid, scaled)
    elif rtype == "mrope":
        # m-rope uses the default table; the section split applies at position
        # construction time (multimodal models pass 3-row position ids)
        pass
    else:
        raise ValueError(f"unsupported rope type: {rtype!r}")

    return RopeTable(inv_freq=inv_freq, mscale=mscale, neox_style=cfg.neox_style)


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _rotation_matrix(dim: int, neox: bool) -> np.ndarray:
    """P such that x @ P == rotate_half(x) (exact: one +-1 per column, so the
    matmul reduces to a signed permutation and is bitwise equal to the
    slice/concat formulation)."""
    P = np.zeros((dim, dim), np.float32)
    half = dim // 2
    if neox:
        for j in range(half):
            P[j + half, j] = -1.0   # out[:half] = -x2
            P[j, j + half] = 1.0    # out[half:] = x1
    else:
        for i in range(half):
            P[2 * i + 1, 2 * i] = -1.0  # out_even = -x_odd
            P[2 * i, 2 * i + 1] = 1.0   # out_odd = x_even
    return P


def apply_rope_rot(
    x: jax.Array,       # [..., num_heads, head_dim]
    cos_full: jax.Array,  # [..., head_dim] (from RopeTable.rot_values)
    sin_full: jax.Array,
    neox_style: bool = True,
) -> jax.Array:
    """Slice-free rotation: x*cos + (x @ P)*sin, P a signed permutation.
    Bit-identical to apply_rope; no per-layer slice/concat ops."""
    P = jnp.asarray(_rotation_matrix(x.shape[-1], neox_style))
    xf = x.astype(jnp.float32)
    rot = jnp.einsum("...d,de->...e", xf, P, preferred_element_type=jnp.float32)
    out = xf * cos_full[..., None, :] + rot * sin_full[..., None, :]
    return out.astype(x.dtype)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, neox_style: bool = True
) -> jax.Array:
    """Rotate a q or k tensor.

    x: [..., num_heads, head_dim]; cos/sin: [..., head_dim/2] broadcast over heads.
    """
    half = x.shape[-1] // 2
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    if neox_style:
        x1, x2 = xf[..., :half], xf[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
