"""SmoothQuant activation-scale calibration.

Parity target: the reference's ``calc_act_scales`` flow
(/root/reference/zhilight/llama.py:214-240, src/model/model_context.h:95-99):
run calibration text through the model collecting per-channel absolute
maxima of every quantized linear's INPUT, then migrate activation outliers
into the weights (``smooth_quant_weights``) so W8A8 int8 serving works from
a raw fp16/bf16 checkpoint.

TPU-native design: instead of the reference's stateful per-rank calibration
hooks inside the C++ linears, one pure jitted forward returns the stats dict
(per-channel |x| maxima) alongside nothing else — stats accumulate across
calibration batches on the host with a running max. Attention runs the plain
dense causal path (no KV-cache machinery: calibration is offline and stats
do not depend on cache mechanics).

Scope: the seven dense-layer linears (q/k/v or fused qkv, o, gate/up or
fused gate_up, down), matching the reference's SmoothQuant coverage. MoE
expert weights keep their own quantization formats (GPTQ/FP8 checkpoints).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["calc_act_scales", "calib_forward"]


def _amax(x: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=0)


def calib_forward(params, cfg, rope, tokens: jax.Array) -> Dict[str, jax.Array]:
    """One calibration pass over a single sequence [T]; returns
    {param_path: per-channel |input| max} for every quantized-linear site."""
    from ..models.llama import _norm, _qkv, _maybe_qk_norm, embed
    from ..ops.attention import prefill_attention
    from ..ops.activations import gated_act
    from ..ops.linear import linear
    from ..ops.rope import apply_rope_rot
    import math

    T = tokens.shape[0]
    positions = jnp.arange(T, dtype=jnp.int32)
    x = embed(params, cfg, tokens)
    cos_f, sin_f = rope.rot_values(positions)
    scale = 1.0 / math.sqrt(cfg.dim_head)
    res_scale = (
        cfg.scale_depth / math.sqrt(cfg.num_layers) if cfg.scale_depth != 1.0 else 1.0
    )
    stats: Dict[str, jax.Array] = {}

    for i in range(cfg.num_layers):
        p = params["layers"][str(i)]
        pre = f"layers.{i}"
        h = _norm(p["ln_attn"], cfg, x)
        for name in ("qkv_proj", "q_proj", "k_proj", "v_proj"):
            if name in p["attn"]:
                stats[f"{pre}.attn.{name}"] = _amax(h)
        q, k, v = _qkv(p["attn"], cfg, h)
        q, k = _maybe_qk_norm(p["attn"], cfg, q, k)
        q = apply_rope_rot(q, cos_f, sin_f, rope.neox_style)
        k = apply_rope_rot(k, cos_f, sin_f, rope.neox_style)
        attn = prefill_attention(
            q, k, v, jnp.int32(0), jnp.int32(T), scale, cfg.sliding_window
        ).reshape(T, cfg.num_heads * cfg.dim_head)
        stats[f"{pre}.attn.o_proj"] = _amax(attn)
        attn_out = linear(p["attn"]["o_proj"], attn)

        if cfg.parallel_residual:
            ff_in = h
        else:
            x = x + attn_out * res_scale
            ff_in = _norm(p["ln_ff"], cfg, x)

        mp = p["mlp"]
        if cfg.is_moe_layer(i):
            # MoE experts keep checkpoint quantization; only record the
            # shared-expert linears when present
            from ..models.moe import moe_layer

            ff_out = moe_layer(mp, cfg, ff_in)
        else:
            for name in ("gate_up_proj", "gate_proj", "up_proj"):
                if name in mp:
                    stats[f"{pre}.mlp.{name}"] = _amax(ff_in)
            if "gate_up_proj" in mp:
                gu = linear(mp["gate_up_proj"], ff_in)
                g, u = jnp.split(gu, 2, axis=-1)
            else:
                g = linear(mp["gate_proj"], ff_in)
                u = linear(mp["up_proj"], ff_in)
            hact = gated_act(g, u, cfg.activate_fn)
            stats[f"{pre}.mlp.down_proj"] = _amax(hact)
            ff_out = linear(mp["down_proj"], hact)

        if cfg.parallel_residual:
            x = x + attn_out + ff_out
        else:
            x = x + ff_out * res_scale
    return stats


def calc_act_scales(
    params, cfg, rope, token_batches: List[np.ndarray]
) -> Dict[str, np.ndarray]:
    """Per-channel activation |max| over calibration batches (running max,
    like the reference's mean-of-max per batch — we keep the stricter max)."""
    fwd = jax.jit(
        lambda p, t: calib_forward(p, cfg, rope, t),
    )
    out: Dict[str, np.ndarray] = {}
    for toks in token_batches:
        stats = jax.device_get(fwd(params, jnp.asarray(toks, jnp.int32)))
        for k, v in stats.items():
            prev = out.get(k)
            out[k] = v if prev is None else np.maximum(prev, v)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}
