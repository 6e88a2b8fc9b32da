"""Fused W4A16 grouped MoE GEMM (ops/pallas/quant_ragged) parity.

Parity target: the reference's quantized grouped expert GEMMs — GPTQMOE and
FP8BlockMOE/DeepGEMM (src/nn/feedforward/feedforward.cpp:967-1075) — which
multiply routed tokens against int4 expert weights without materializing a
dense stack. Checks (a) the kernel against per-expert dequant matmuls,
(b) the full moe_layer against its own dequant fallback, (c) the
group-aligned layout helper.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.ops.pallas.quant_ragged import (
    pack_expert_int4,
    ragged_layout,
    w4a16_ragged_matmul,
)
from zhilight_tpu.ops.quant import dequant_int4


def _mk(E=5, K=256, N=256, gs=128, seed=0):
    rng = np.random.RandomState(seed)
    nib = rng.randint(0, 16, size=(E, K, N)).astype(np.int8)
    G = K // gs
    scales = (rng.rand(E, G, N).astype(np.float32) + 0.5) * 0.02
    zeros = rng.randint(0, 16, size=(E, G, N)).astype(np.float32)
    return nib, scales, zeros


@pytest.mark.parametrize("tm", [8, 64])
def test_kernel_matches_dequant(tm):
    E, K, N = 5, 256, 256
    nib, scales, zeros = _mk(E, K, N)
    rng = np.random.RandomState(1)
    R = 37
    flat_e = rng.randint(0, E, size=R).astype(np.int32)
    xin = jnp.asarray(rng.randn(R, K), jnp.bfloat16)

    sort_idx, dest, tile_expert, num_occ, mp = ragged_layout(jnp.asarray(flat_e), E, tm)
    xp = jnp.zeros((mp, K), jnp.bfloat16).at[dest].set(xin[sort_idx])
    out = w4a16_ragged_matmul(
        xp, pack_expert_int4(jnp.asarray(nib)), jnp.asarray(scales),
        jnp.asarray(zeros), tile_expert, num_occ, interpret=True,
    )
    got = np.asarray(out)[np.asarray(dest)].astype(np.float32)

    xf = np.asarray(xin, np.float32)
    for i, r in enumerate(np.asarray(sort_idx)):
        e = flat_e[r]
        w = np.asarray(dequant_int4(
            jnp.asarray(nib[e]), jnp.asarray(scales[e]), jnp.asarray(zeros[e]),
            jnp.float32,
        ))
        ref = xf[r] @ w
        rel = np.abs(got[i] - ref) / (np.abs(ref) + 1e-2)
        assert rel.max() < 0.05, (i, rel.max())


def test_kernel_many_experts_few_rows():
    """Decode shape on a many-expert model: most m-tiles are padding past the
    occupied prefix — the kernel skips them (pl.when + frozen DMA indices)
    and their garbage output rows are never addressed by dest."""
    E, K, N, tm = 64, 256, 256, 8
    nib, scales, zeros = _mk(E, K, N)
    rng = np.random.RandomState(7)
    R = 8
    flat_e = rng.randint(0, E, size=R).astype(np.int32)
    xin = jnp.asarray(rng.randn(R, K), jnp.bfloat16)

    sort_idx, dest, tile_expert, num_occ, mp = ragged_layout(jnp.asarray(flat_e), E, tm)
    assert int(num_occ[0]) <= R  # occupied prefix far below the static bound
    assert mp // tm > int(num_occ[0])
    assert int(np.asarray(dest).max()) < int(num_occ[0]) * tm
    xp = jnp.zeros((mp, K), jnp.bfloat16).at[dest].set(xin[sort_idx])
    out = w4a16_ragged_matmul(
        xp, pack_expert_int4(jnp.asarray(nib)), jnp.asarray(scales),
        jnp.asarray(zeros), tile_expert, num_occ, interpret=True,
    )
    got = np.asarray(out)[np.asarray(dest)].astype(np.float32)
    xf = np.asarray(xin, np.float32)
    for i, r in enumerate(np.asarray(sort_idx)):
        e = flat_e[r]
        w = np.asarray(dequant_int4(
            jnp.asarray(nib[e]), jnp.asarray(scales[e]), jnp.asarray(zeros[e]),
            jnp.float32,
        ))
        ref = xf[r] @ w
        rel = np.abs(got[i] - ref) / (np.abs(ref) + 1e-2)
        assert rel.max() < 0.05, (i, rel.max())


def test_layout_group_alignment():
    E, tm = 4, 8
    flat_e = jnp.asarray(np.array([2, 0, 2, 2, 3, 0], np.int32))
    sort_idx, dest, tile_expert, num_occ, mp = ragged_layout(flat_e, E, tm)
    assert mp % tm == 0
    # every row lands inside the occupied tile prefix
    assert int(np.asarray(dest).max()) < int(num_occ[0]) * tm
    es = np.asarray(flat_e)[np.asarray(sort_idx)]
    d = np.asarray(dest)
    # each row's tile is owned by that row's expert
    te = np.asarray(tile_expert)
    for row, e in zip(d, es):
        assert te[row // tm] == e
    # rows are unique and groups start tm-aligned
    assert len(set(d.tolist())) == len(d)
    for e in np.unique(es):
        first = d[es == e].min()
        assert first % tm == 0


def test_moe_layer_fused_matches_fallback(monkeypatch):
    """moe_layer through the fused kernel (interpret) == dequant fallback."""
    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.models import moe as M

    cfg = ModelConfig(
        model_type="qwen2_moe",
        num_layers=1,
        dim_model=256,
        num_heads=4,
        dim_head=64,
        num_kv_heads=4,
        dim_ff=256,
        vocab_size=64,
        dtype="float32",
        moe=MoEConfig(
            num_experts=4,
            top_k=2,
            intermediate_size=256,
            scoring_func="softmax",
            topk_method="greedy",
            norm_topk_prob=True,
        ),
    )
    rng = np.random.RandomState(3)
    E, D, F = 4, 256, 256
    gs = 128

    def qproj(K, N):
        nib = rng.randint(0, 16, size=(E, K, N)).astype(np.int8)
        G = K // gs
        return {
            "w_p": pack_expert_int4(jnp.asarray(nib)),
            "scales": jnp.asarray((rng.rand(E, G, N) * 0.02 + 0.01), jnp.float32),
            "zeros": jnp.asarray(np.full((E, G, N), 8.0), jnp.float32),
        }

    p = {
        "router": {"w": jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)},
        "experts": {
            "gate_proj": qproj(D, F),
            "up_proj": qproj(D, F),
            "down_proj": qproj(F, D),
        },
    }
    x = jnp.asarray(rng.randn(9, D) * 0.5, jnp.bfloat16)

    monkeypatch.setenv("ZT_PALLAS_INTERPRET", "1")
    assert M._use_quant_ragged(p["experts"])
    fused = np.asarray(M.moe_layer(p, cfg, x), np.float32)

    monkeypatch.setenv("ZT_NO_PALLAS", "1")
    assert not M._use_quant_ragged(p["experts"])
    ref = np.asarray(M.moe_layer(p, cfg, x), np.float32)

    # the fused kernel is MORE precise than the fallback (it never rounds
    # dequantized weights to bf16); differences are fallback rounding noise
    np.testing.assert_allclose(fused, ref, rtol=0.05, atol=0.03)


def test_moe_layer_quant_expert_parallel(monkeypatch):
    """EP mesh (VERDICT r3 #4): the fused W4A16 grouped kernel runs per
    expert shard — parity vs the unsharded layer, no expert-weight-sized
    collectives, and no bf16 expert-stack materialization in the HLO."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.models import moe as M
    from zhilight_tpu.parallel import enable_kernel_partitioning

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("tp",))

    cfg = ModelConfig(
        model_type="qwen2_moe",
        num_layers=1,
        dim_model=256,
        num_heads=4,
        dim_head=64,
        num_kv_heads=4,
        dim_ff=256,
        vocab_size=64,
        dtype="float32",
        moe=MoEConfig(
            num_experts=8,
            top_k=2,
            intermediate_size=256,
            scoring_func="softmax",
            topk_method="greedy",
            norm_topk_prob=True,
        ),
    )
    rng = np.random.RandomState(11)
    E, D, F = 8, 256, 256
    gs = 128

    def qproj(K, N):
        nib = rng.randint(0, 16, size=(E, K, N)).astype(np.int8)
        G = K // gs
        return {
            "w_p": pack_expert_int4(jnp.asarray(nib)),
            "scales": jnp.asarray((rng.rand(E, G, N) * 0.02 + 0.01), jnp.float32),
            "zeros": jnp.asarray(np.full((E, G, N), 8.0), jnp.float32),
        }

    p = {
        "router": {"w": jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)},
        "experts": {
            "gate_proj": qproj(D, F),
            "up_proj": qproj(D, F),
            "down_proj": qproj(F, D),
        },
    }
    T = 16
    x_host = jnp.asarray(rng.randn(T, D) * 0.5, jnp.bfloat16)

    monkeypatch.setenv("ZT_PALLAS_INTERPRET", "1")
    # unsharded reference through the same fused (interpret) kernel
    want = np.asarray(M.moe_layer(p, cfg, x_host), np.float32)

    espec = NamedSharding(mesh, P("tp", None, None))
    rep = NamedSharding(mesh, P())
    p_sh = {
        "router": {"w": jax.device_put(p["router"]["w"], rep)},
        "experts": {
            proj: {k: jax.device_put(v, espec) for k, v in d.items()}
            for proj, d in p["experts"].items()
        },
    }
    x = jax.device_put(x_host, rep)

    enable_kernel_partitioning(True)
    try:
        with jax.set_mesh(mesh):
            fn = jax.jit(lambda p, x: M.moe_layer(p, cfg, x))
            hlo = fn.lower(p_sh, x).compile().as_text()
            got = np.asarray(jax.device_get(fn(p_sh, x)), np.float32)
    finally:
        enable_kernel_partitioning(False)

    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # collectives must be token-sized, not expert-weight-sized
    big = []
    for mt in re.finditer(r"(all-gather|all-to-all)[^=]*= \w+\[([\d,]*)\]", hlo):
        dims = [int(d) for d in mt.group(2).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        if elems > T * D * 8:
            big.append(mt.group(0))
    assert not big, "expert-scale collective found:\n" + "\n".join(big)

    # no bf16/f32 dequantized expert stack may appear anywhere: the largest
    # dense buffer of one shard's stack would be E/4 * K * N elements
    stack_elems = (E // 4) * D * F
    fat = [
        mt.group(0)
        for mt in re.finditer(r"(bf16|f32)\[([\d,]+)\][^ ]* (?:convert|multiply)", hlo)
        if int(np.prod([int(d) for d in mt.group(2).split(",")])) >= stack_elems
    ]
    assert not fat, "dequantized expert stack materialized:\n" + "\n".join(fat[:3])


def _act_order_params(rng, E, D, F, gs):
    """Expert stacks the loader produces for desc_act=true: rows group-sorted
    by each expert's g_idx + the activation-side perm (hf_loader.py act_order
    stacking; reference exllama g_idx, src/nn/quant/gptq/)."""
    def qproj(K, N, with_perm):
        nib = rng.randint(0, 16, size=(E, K, N)).astype(np.int8)
        G = K // gs
        d = {
            "w_p": pack_expert_int4(jnp.asarray(nib)),
            "scales": jnp.asarray((rng.rand(E, G, N) * 0.02 + 0.01), jnp.float32),
            "zeros": jnp.asarray(np.full((E, G, N), 8.0), jnp.float32),
        }
        if with_perm:
            perms = np.stack([rng.permutation(K) for _ in range(E)]).astype(np.int32)
            d["perm"] = jnp.asarray(perms)
        return d

    return {
        "router": {"w": jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)},
        "experts": {
            "gate_proj": qproj(D, F, True),
            "up_proj": qproj(D, F, False),   # mixed: one trivial-g_idx proj
            "down_proj": qproj(F, D, True),
        },
    }


def test_moe_act_order_fused_matches_fallback(monkeypatch):
    """desc_act=true expert stacks (VERDICT r3 #7): the fused kernel's
    token-side permutation gather == the dequant fallback's row scatter."""
    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.models import moe as M

    cfg = ModelConfig(
        model_type="qwen2_moe", num_layers=1, dim_model=256, num_heads=4,
        dim_head=64, num_kv_heads=4, dim_ff=256, vocab_size=64, dtype="float32",
        moe=MoEConfig(num_experts=4, top_k=2, intermediate_size=256,
                      scoring_func="softmax", topk_method="greedy",
                      norm_topk_prob=True),
    )
    rng = np.random.RandomState(17)
    p = _act_order_params(rng, E=4, D=256, F=256, gs=128)
    x = jnp.asarray(rng.randn(9, 256) * 0.5, jnp.bfloat16)

    monkeypatch.setenv("ZT_PALLAS_INTERPRET", "1")
    assert M._use_quant_ragged(p["experts"])
    fused = np.asarray(M.moe_layer(p, cfg, x), np.float32)

    monkeypatch.setenv("ZT_NO_PALLAS", "1")
    ref = np.asarray(M.moe_layer(p, cfg, x), np.float32)
    np.testing.assert_allclose(fused, ref, rtol=0.05, atol=0.03)


def test_moe_act_order_expert_parallel(monkeypatch):
    """act_order stacks under the EP mesh: perm shards with the expert dim."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.models import moe as M
    from zhilight_tpu.parallel import enable_kernel_partitioning

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("tp",))
    cfg = ModelConfig(
        model_type="qwen2_moe", num_layers=1, dim_model=256, num_heads=4,
        dim_head=64, num_kv_heads=4, dim_ff=256, vocab_size=64, dtype="float32",
        moe=MoEConfig(num_experts=8, top_k=2, intermediate_size=256,
                      scoring_func="softmax", topk_method="greedy",
                      norm_topk_prob=True),
    )
    rng = np.random.RandomState(23)
    p = _act_order_params(rng, E=8, D=256, F=256, gs=128)
    x_host = jnp.asarray(rng.randn(12, 256) * 0.5, jnp.bfloat16)

    monkeypatch.setenv("ZT_PALLAS_INTERPRET", "1")
    want = np.asarray(M.moe_layer(p, cfg, x_host), np.float32)

    espec3 = NamedSharding(mesh, P("tp", None, None))
    espec2 = NamedSharding(mesh, P("tp", None))
    rep = NamedSharding(mesh, P())
    p_sh = {
        "router": {"w": jax.device_put(p["router"]["w"], rep)},
        "experts": {
            proj: {
                k: jax.device_put(v, espec2 if k == "perm" else espec3)
                for k, v in d.items()
            }
            for proj, d in p["experts"].items()
        },
    }
    x = jax.device_put(x_host, rep)
    enable_kernel_partitioning(True)
    try:
        with jax.set_mesh(mesh):
            got = np.asarray(
                jax.device_get(jax.jit(lambda p, x: M.moe_layer(p, cfg, x))(p_sh, x)),
                np.float32,
            )
    finally:
        enable_kernel_partitioning(False)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_moe_nonaligned_down_k_pads_and_matches(monkeypatch):
    """DeepSeek-V2-Lite-geometry expert down_proj (K=1408, gs=128 =>
    K % 2*gs != 0): the loader pads K with zero-scale groups
    (hf_loader._pad_canon_int4) so the fused planar kernel still applies —
    previously these stacks silently fell back to the bf16 [E, K, N]
    dequant (29 GB of HLO temps at 27 layers: compile OOM, r5)."""
    from zhilight_tpu.config import ModelConfig
    from zhilight_tpu.config.model_config import MoEConfig
    from zhilight_tpu.models import moe as M
    from zhilight_tpu.utils.hf_loader import map_hf_params
    from zhilight_tpu.utils.quant_convert import pack_gptq

    D, F, E, gs = 256, 1408, 2, 128
    cfg = ModelConfig(
        model_type="mixtral", num_layers=1, dim_model=D, num_heads=4,
        dim_head=64, num_kv_heads=4, dim_ff=F, vocab_size=64, dtype="float32",
        moe=MoEConfig(num_experts=E, top_k=2, intermediate_size=F,
                      scoring_func="softmax", topk_method="greedy"),
    )
    rng = np.random.RandomState(7)
    tensors = [("model.layers.0.block_sparse_moe.gate.weight",
                (rng.randn(E, D) * 0.1).astype(np.float32))]
    for e in range(E):
        for w_name, K, N in (("w1", D, F), ("w3", D, F), ("w2", F, D)):
            G = K // gs
            nib = rng.randint(0, 16, size=(K, N)).astype(np.int8)
            scales = ((rng.rand(G, N) + 0.5) * 0.01).astype(np.float32)
            zeros = rng.randint(1, 16, size=(G, N)).astype(np.float32)
            qw, qz, sc = pack_gptq(nib, zeros, scales)
            base = f"model.layers.0.block_sparse_moe.experts.{e}.{w_name}"
            tensors += [(f"{base}.qweight", qw), (f"{base}.qzeros", qz),
                        (f"{base}.scales", sc)]
    tree = map_hf_params(tensors, cfg, strict=False, quant_method="gptq")
    p = {"router": {"w": tree["layers"]["0"]["mlp"]["router"]["w"]},
         "experts": tree["layers"]["0"]["mlp"]["experts"]}

    down = p["experts"]["down_proj"]
    assert down["w_p"].shape == (E, 768, D)       # K 1408 -> 1536 packed/2
    assert down["scales"].shape == (E, 12, D)     # 11 -> 12 groups
    assert np.asarray(down["scales"][:, 11]).max() == 0.0

    x = jnp.asarray(rng.randn(5, D) * 0.5, jnp.bfloat16)
    monkeypatch.setenv("ZT_PALLAS_INTERPRET", "1")
    assert M._use_quant_ragged(p["experts"])
    fused = np.asarray(M.moe_layer(p, cfg, x), np.float32)

    monkeypatch.setenv("ZT_NO_PALLAS", "1")
    ref = np.asarray(M.moe_layer(p, cfg, x), np.float32)
    np.testing.assert_allclose(fused, ref, rtol=0.05, atol=0.05)
