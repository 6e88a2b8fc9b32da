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
        if "perm" in p:
            # act_order stacks store rows group-sorted by each expert's
            # g_idx (w_sorted[i] = w_orig[perm[i]]); scatter them back so
            # the fallback consumes unpermuted activations
            w = jax.vmap(lambda we, pe: jnp.zeros_like(we).at[pe].set(we))(
                w, p["perm"]
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
    with per-tile dequant in VMEM — no bf16 [E, K, N] stack per forward.
    On tp/ep meshes the call goes through the expert-sharded SPMD wrapper
    (ops/pallas/partitioned.w4a16_moe_experts_sharded)."""
    import os

    if os.environ.get("ZT_NO_PALLAS") == "1":
        return False
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or os.environ.get("ZT_PALLAS_INTERPRET") == "1"):
        return False
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


def _pallas_interpret() -> bool:
    import os

    return (
        jax.default_backend() != "tpu"
        and os.environ.get("ZT_PALLAS_INTERPRET") == "1"
    )


def quant_experts_contribution(
    x: jax.Array,            # [T, D] raw token activations
    flat_experts: jax.Array, # [R = T*K] GLOBAL expert of each (token, k) pair
    pair_weights: jax.Array, # [R] f32 routing weight per pair
    expert_arrays,           # flat (w_p, scales, zeros[, perm]) per proj
    fused: bool,             # True => [gate_up, down]; else [gate, up, down]
    top_k: int,
    e0,                      # first expert id held locally (0 when unsharded)
    act: str,
    interpret: bool = False,
    has_perm: bool = False,  # act_order stacks: per-expert K-permutation
) -> jax.Array:
    """Weighted scatter-added contribution [T, D] of experts
    [e0, e0 + E_local): the single code path behind both the unsharded
    forward and each expert-parallel shard's lower_fn (reference
    MOE_EXP_PARALLEL: every rank computes its local experts for all routed
    tokens, then all-reduces; feedforward.cpp:251-267).

    Remote-expert pairs route into an overflow bucket past the occupied
    tiles — never computed, never indexed into the local stacks — and their
    (unwritten, possibly non-finite) output rows are masked with ``where``
    before the scatter."""
    from ..ops.pallas.quant_ragged import ragged_layout, w4a16_ragged_matmul

    T, D = x.shape
    E_local = expert_arrays[0].shape[0]
    local = flat_experts - e0
    valid = (local >= 0) & (local < E_local)
    bucket = jnp.where(valid, local, E_local).astype(jnp.int32)
    R = bucket.shape[0]
    TM = _ragged_tile(R)
    sort_idx, dest, tile_expert, num_occ, mp = ragged_layout(
        bucket, E_local + 1, TM, occ_experts=E_local
    )
    token_idx = sort_idx // top_k
    xp = jnp.zeros((mp, D), x.dtype).at[dest].set(x[token_idx])
    stride = 4 if has_perm else 3
    # expert of each PADDED row (tile_expert is already capped at E_local-1)
    row_expert = jnp.repeat(tile_expert, TM) if has_perm else None

    def mm(i, xin):
        w_p, scales, zeros = expert_arrays[stride * i : stride * i + 3]
        Kw = 2 * w_p.shape[1]
        if xin.shape[1] < Kw:
            # loader-padded K (zero-scale groups): zero activation columns
            xin = jnp.pad(xin, ((0, 0), (0, Kw - xin.shape[1])))
        if has_perm:
            # act_order: gather each row's activations with its expert's
            # g_idx permutation (reference exllama q_gemm, src/nn/quant/gptq/)
            perm = expert_arrays[stride * i + 3]  # [E_local, K_proj]
            xin = jnp.take_along_axis(xin, perm[row_expert], axis=1)
        return w4a16_ragged_matmul(
            xin, w_p, scales, zeros, tile_expert, num_occ, interpret=interpret
        )

    if fused:
        g, u = jnp.split(mm(0, xp), 2, axis=-1)
        down_i = 1
    else:
        g = mm(0, xp)
        u = mm(1, xp)
        down_i = 2
    h = gated_act(g, u, act)
    down = mm(down_i, h)

    out_sorted = down[dest]
    wv = pair_weights.astype(jnp.float32)[sort_idx]
    keep = valid[sort_idx][:, None]
    out_sorted = jnp.where(
        keep, out_sorted.astype(jnp.float32) * wv[:, None], 0.0
    )
    return jnp.zeros((T, D), jnp.float32).at[token_idx].add(out_sorted)


def _grouped_experts(
    p_experts: Params,  # stacked weights: [E, in, out] per proj
    x_sorted: jax.Array,  # [T*K, D] tokens sorted by expert
    group_sizes: jax.Array,  # [E]
    act: str,
) -> jax.Array:
    dt = x_sorted.dtype

    def w_of(name, width):
        # loader-padded quant stacks carry zero-value pad rows past the
        # activation width (hf_loader._pad_canon_int4) — slice them off
        w = _expert_weight(p_experts[name], dt)
        return w[:, :width] if w.shape[1] > width else w

    if "gate_up_proj" in p_experts:
        gu = jax.lax.ragged_dot(x_sorted, w_of("gate_up_proj", x_sorted.shape[-1]), group_sizes)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = jax.lax.ragged_dot(x_sorted, w_of("gate_proj", x_sorted.shape[-1]), group_sizes)
        u = jax.lax.ragged_dot(x_sorted, w_of("up_proj", x_sorted.shape[-1]), group_sizes)
    h = gated_act(g, u, act)
    return jax.lax.ragged_dot(h, w_of("down_proj", h.shape[-1]), group_sizes)


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
    pair_w = weights.reshape(-1)           # [T*K] f32
    if _use_quant_ragged(p["experts"]):
        from ..parallel import kernel_partitioning_enabled

        fused = "gate_up_proj" in p["experts"]
        names = ("gate_up_proj", "down_proj") if fused else (
            "gate_proj", "up_proj", "down_proj"
        )
        has_perm = any("perm" in p["experts"][nm] for nm in names)
        arrs = []
        for nm in names:
            pr = p["experts"][nm]
            arrs += [pr["w_p"], pr["scales"], pr["zeros"]]
            if has_perm:
                # projections quantized with trivial g_idx get the identity
                # so the operand layout stays uniform
                perm = pr.get("perm")
                if perm is None:
                    Kp = 2 * pr["w_p"].shape[1]
                    perm = jnp.broadcast_to(
                        jnp.arange(Kp, dtype=jnp.int32),
                        (pr["w_p"].shape[0], Kp),
                    )
                arrs.append(perm)
        if kernel_partitioning_enabled():
            # expert-sharded meshes: per-shard local experts + psum
            from ..ops.pallas.partitioned import w4a16_moe_experts_sharded

            routed = w4a16_moe_experts_sharded(
                x, flat_experts, pair_w, arrs, fused, K, cfg.activate_fn,
                interpret=_pallas_interpret(), has_perm=has_perm,
            )
        else:
            routed = quant_experts_contribution(
                x, flat_experts, pair_w, arrs, fused, K, 0, cfg.activate_fn,
                interpret=_pallas_interpret(), has_perm=has_perm,
            )
        routed = routed.astype(x.dtype)
    else:
        sort_idx = jnp.argsort(flat_experts)
        token_idx = sort_idx // K  # original token of each sorted row
        x_sorted = x[token_idx]
        group_sizes = jnp.bincount(flat_experts, length=E)
        out_sorted = _grouped_experts(
            p["experts"], x_sorted, group_sizes, cfg.activate_fn
        )
        out_sorted = out_sorted * pair_w[sort_idx][:, None].astype(out_sorted.dtype)
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
