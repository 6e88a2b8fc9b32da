"""Mixture-of-experts feed-forward.

Parity target: reference ``nn::FeedForward`` MoE impls
(src/nn/feedforward/feedforward.cpp:251-1075): softmax/sigmoid scoring,
greedy / group_limited_greedy / noaux_tc top-k routing (DeepSeek-V2/V3),
norm_topk_prob, routed_scaling_factor, shared experts with optional gate
(qwen2-moe), and grouped expert GEMMs (reference FusedMOE / DeepGEMM path).

TPU-native design: tokens are sorted by expert id and run through
``jax.lax.ragged_dot`` grouped matmuls — the XLA:TPU equivalent of the
reference's grouped FP8 GEMM (get_grouped_input token alignment,
feedforward.cpp:967-1075) with no capacity dropping. Expert parallelism
shards the expert dim of the stacked weights over the "tp" axis (reference
MOE_EXP_PARALLEL, feedforward.cpp:251-262).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config.model_config import ModelConfig, MoEConfig
from ..ops.activations import gated_act, get_activation
from ..ops.linear import linear

__all__ = ["moe_layer", "select_experts", "init_moe_params"]

Params = Dict[str, jax.Array]


def select_experts(
    router_logits: jax.Array,  # [T, E] float32
    m: MoEConfig,
    correction_bias: jax.Array = None,  # [E] for noaux_tc
) -> Tuple[jax.Array, jax.Array]:
    """Routing: returns (weights [T, K] float32, expert_ids [T, K] int32).

    Implements the three reference topk_methods (feedforward.cpp MOEImpl):
      greedy               — plain top-k over scores
      group_limited_greedy — DeepSeek-V2: top groups by max score, then top-k
      noaux_tc             — DeepSeek-V3: sigmoid + correction bias, groups by
                             sum of top-2, weights from uncorrected scores
    """
    T, E = router_logits.shape
    if m.scoring_func == "softmax":
        scores = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    elif m.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        raise ValueError(f"unknown scoring_func {m.scoring_func!r}")

    if m.topk_method == "noaux_tc":
        choice = scores + correction_bias[None, :]
    else:
        choice = scores

    if m.topk_method in ("group_limited_greedy", "noaux_tc") and m.n_group > 1:
        g = choice.reshape(T, m.n_group, E // m.n_group)
        if m.topk_method == "noaux_tc":
            top2 = jax.lax.top_k(g, 2)[0]
            group_scores = jnp.sum(top2, axis=-1)  # [T, n_group]
        else:
            group_scores = jnp.max(g, axis=-1)
        _, top_groups = jax.lax.top_k(group_scores, m.topk_group)
        group_mask = jnp.zeros((T, m.n_group), jnp.bool_).at[
            jnp.arange(T)[:, None], top_groups
        ].set(True)
        expert_mask = jnp.repeat(group_mask, E // m.n_group, axis=-1)
        choice = jnp.where(expert_mask, choice, -jnp.inf)

    _, expert_ids = jax.lax.top_k(choice, m.top_k)  # [T, K]
    weights = jnp.take_along_axis(scores, expert_ids, axis=-1)

    if m.norm_topk_prob:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-20)
    weights = weights * m.routed_scaling_factor
    return weights, expert_ids.astype(jnp.int32)


def _expert_weight(p: Params, dtype) -> jax.Array:
    """Stacked expert weight [E, in, out]; dequantizes canonical int4/fp8
    stacks (reference GPTQMOE / FP8BlockMOE paths) into the compute dtype.
    Fallback path — the fused route is :func:`_use_quant_ragged`."""
    if "w" in p:
        return p["w"]
    if "w_p" in p:
        from ..ops.quant import dequant_int4

        w = jax.vmap(lambda wp, s, z: dequant_int4(wp, s, z, dtype))(
            p["w_p"], p["scales"], p["zeros"]
        )
        return w
    raise ValueError(f"unknown expert weight format: {sorted(p.keys())}")


def _ragged_tile(num_rows: int) -> int:
    """m-tile for the fused quantized grouped GEMM: small tiles keep the
    group-alignment padding negligible at decode row counts; prefill rows
    amortize bigger tiles."""
    return 8 if num_rows <= 512 else 64


def _use_quant_ragged(p_experts: Params) -> bool:
    """Route to the fused W4A16 grouped kernel (reference GPTQMOE/DeepGEMM
    class, feedforward.cpp:967-1075): expert weights stream at 4 bits/weight
    with per-tile dequant in VMEM — no bf16 [E, K, N] stack per forward."""
    import os

    if os.environ.get("ZT_NO_PALLAS") == "1":
        return False
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or os.environ.get("ZT_PALLAS_INTERPRET") == "1"):
        return False
    from ..parallel import kernel_partitioning_enabled

    if kernel_partitioning_enabled():
        return False  # EP meshes keep the dequant path (no SPMD rule yet)
    for proj in p_experts.values():
        wp = proj.get("w_p")
        if wp is None or wp.dtype != jnp.uint8:
            return False
        E, Kh, N = wp.shape
        K = 2 * Kh
        gs = K // proj["scales"].shape[1]
        if K % gs or gs % 32 or N % 128 or Kh % gs:
            return False
    return True


def _grouped_experts_quant(
    p_experts: Params,
    x: jax.Array,            # [T, D] raw token activations
    flat_experts: jax.Array, # [T*K] expert of each (token, k) pair
    top_k: int,
    num_experts: int,
    act: str,
):
    """Fused quantized grouped experts: group-aligned padded rows shared by
    all three projections. Returns (out_sorted [T*K, D], sort_idx,
    token_idx) in sorted-by-expert row order."""
    import os

    from ..ops.pallas.quant_ragged import ragged_layout, w4a16_ragged_matmul

    interpret = (
        jax.default_backend() != "tpu"
        and os.environ.get("ZT_PALLAS_INTERPRET") == "1"
    )
    R = flat_experts.shape[0]
    TM = _ragged_tile(R)
    sort_idx, dest, tile_expert, num_occ, mp = ragged_layout(
        flat_experts, num_experts, TM
    )
    token_idx = sort_idx // top_k
    xp = jnp.zeros((mp, x.shape[1]), x.dtype).at[dest].set(x[token_idx])

    def mm(proj, xin):
        return w4a16_ragged_matmul(
            xin, proj["w_p"], proj["scales"], proj["zeros"], tile_expert,
            num_occ, interpret=interpret,
        )

    if "gate_up_proj" in p_experts:
        gu = mm(p_experts["gate_up_proj"], xp)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = mm(p_experts["gate_proj"], xp)
        u = mm(p_experts["up_proj"], xp)
    h = gated_act(g, u, act)
    down = mm(p_experts["down_proj"], h)
    return down[dest].astype(x.dtype), sort_idx, token_idx


def _grouped_experts(
    p_experts: Params,  # stacked weights: [E, in, out] per proj
    x_sorted: jax.Array,  # [T*K, D] tokens sorted by expert
    group_sizes: jax.Array,  # [E]
    act: str,
) -> jax.Array:
    dt = x_sorted.dtype
    if "gate_up_proj" in p_experts:
        gu = jax.lax.ragged_dot(x_sorted, _expert_weight(p_experts["gate_up_proj"], dt), group_sizes)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = jax.lax.ragged_dot(x_sorted, _expert_weight(p_experts["gate_proj"], dt), group_sizes)
        u = jax.lax.ragged_dot(x_sorted, _expert_weight(p_experts["up_proj"], dt), group_sizes)
    h = gated_act(g, u, act)
    return jax.lax.ragged_dot(h, _expert_weight(p_experts["down_proj"], dt), group_sizes)


def moe_layer(p: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """x: [T, D] -> [T, D]."""
    m = cfg.moe
    T, D = x.shape
    K, E = m.top_k, m.num_experts

    router_logits = jnp.dot(
        x.astype(jnp.float32), p["router"]["w"].astype(jnp.float32)
    )
    bias = p["router"].get("e_score_correction_bias")
    weights, expert_ids = select_experts(router_logits, m, bias)

    # sort token-expert pairs by expert id -> grouped GEMM layout
    flat_experts = expert_ids.reshape(-1)  # [T*K]
    if _use_quant_ragged(p["experts"]):
        out_sorted, sort_idx, token_idx = _grouped_experts_quant(
            p["experts"], x, flat_experts, K, E, cfg.activate_fn
        )
    else:
        sort_idx = jnp.argsort(flat_experts)
        token_idx = sort_idx // K  # original token of each sorted row
        x_sorted = x[token_idx]
        group_sizes = jnp.bincount(flat_experts, length=E)
        out_sorted = _grouped_experts(
            p["experts"], x_sorted, group_sizes, cfg.activate_fn
        )
    out_sorted = out_sorted * weights.reshape(-1)[sort_idx][:, None].astype(out_sorted.dtype)

    routed = jnp.zeros((T, D), out_sorted.dtype).at[token_idx].add(out_sorted)
    routed = routed.astype(x.dtype)

    if "shared_expert" in p:
        from .llama import dense_mlp

        shared = dense_mlp(p["shared_expert"], cfg, x)
        if "shared_expert_gate" in p:
            gate = jax.nn.sigmoid(
                linear(p["shared_expert_gate"], x).astype(jnp.float32)
            )
            shared = (shared.astype(jnp.float32) * gate).astype(x.dtype)
        routed = routed + shared
    return routed


def init_moe_params(cfg: ModelConfig, rng: jax.Array, dtype) -> Params:
    m = cfg.moe
    d, f, E = cfg.dim_model, m.intermediate_size, m.num_experts
    k = iter(jax.random.split(rng, 8))

    def dense(shape, fan_in):
        return (jax.random.normal(next(k), shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)

    p: Params = {
        "router": {"w": dense((d, E), d).astype(jnp.float32)},
        "experts": {
            "gate_proj": {"w": dense((E, d, f), d)},
            "up_proj": {"w": dense((E, d, f), d)},
            "down_proj": {"w": dense((E, f, d), f)},
        },
    }
    if m.topk_method == "noaux_tc":
        p["router"]["e_score_correction_bias"] = jnp.zeros((E,), jnp.float32)
    if m.shared_expert_intermediate_size:
        sf = m.shared_expert_intermediate_size
        p["shared_expert"] = {
            "gate_proj": {"w": dense((d, sf), d)},
            "up_proj": {"w": dense((d, sf), d)},
            "down_proj": {"w": dense((sf, d), sf)},
        }
        if m.shared_expert_gate:
            p["shared_expert_gate"] = {"w": dense((d, 1), d)}
    return p
