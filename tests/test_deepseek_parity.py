"""DeepSeek-V2/V3 (MLA + fine-grained MoE) logit parity vs HF transformers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import adapt_hf_config
from tests.test_model_parity import hf_reference_logits, run_engine
from zhilight_tpu.utils.hf_loader import map_hf_params


def deepseek_v2_cfg(**kw):
    base = dict(
        model_type="deepseek_v2",
        num_hidden_layers=2,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=4,
        intermediate_size=96,
        moe_intermediate_size=48,
        vocab_size=128,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        rope_theta=10000.0,
        torch_dtype="float32",
        hidden_act="silu",
        tie_word_embeddings=False,
        # MLA
        q_lora_rank=None,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        qk_head_dim=24,
        # MoE
        n_routed_experts=4,
        n_shared_experts=1,
        num_experts_per_tok=2,
        routed_scaling_factor=1.0,
        n_group=2,
        topk_group=1,
        topk_method="group_limited_greedy",
        scoring_func="softmax",
        norm_topk_prob=False,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        attention_bias=False,
    )
    base.update(kw)
    return base


CASES = {
    "v2-lite-style": dict(),
    "v2-qlora": dict(q_lora_rank=24),
    "v3-style": dict(
        model_type="deepseek_v3",
        q_lora_rank=24,
        topk_method="noaux_tc",
        scoring_func="sigmoid",
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
    ),
}


@pytest.mark.parametrize("case", CASES.keys())
def test_deepseek_parity(case):
    hf_cfg = deepseek_v2_cfg(**CASES[case])
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, hf_cfg["vocab_size"], size=14).astype(np.int32)

    state, ref_logits = hf_reference_logits(hf_cfg, tokens)
    cfg = adapt_hf_config(hf_cfg).replace(dtype="float32")
    assert cfg.mla.enabled
    params = map_hf_params(state.items(), cfg, dtype=jnp.float32, strict=False)
    if cfg.tie_lm_head and "lm_head" in params:
        del params["lm_head"]

    got = run_engine(cfg, params, tokens)
    want = ref_logits[len(tokens) - 4 :]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_mla_pallas_decode_matches_jnp():
    """Pallas latent MQA decode (interpret mode) vs the jnp absorbed path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from zhilight_tpu.models import mla as M
    from zhilight_tpu.ops.pallas.paged_attention import paged_mla_decode

    rng = np.random.RandomState(0)
    B, H, lora, rope_d, S, MAXP = 3, 4, 128, 64, 16, 4
    stored = ((lora + rope_d) + 127) // 128 * 128
    N = B * MAXP * S
    pool = jnp.asarray(rng.randn(N, stored), jnp.float32)
    # zero the pad lanes like write_latent does
    pool = pool.at[:, lora + rope_d :].set(0.0)
    q_nope = jnp.asarray(rng.randn(B, H, 96), jnp.float32)
    q_pe = jnp.asarray(rng.randn(B, H, rope_d), jnp.float32)
    w_uk = jnp.asarray(rng.randn(lora, H, 96), jnp.float32) * 0.1
    w_uv = jnp.asarray(rng.randn(lora, H, 64), jnp.float32) * 0.1
    context_lens = jnp.asarray(rng.randint(1, MAXP * S, size=B).astype(np.int32))
    pt = np.stack([b * MAXP + np.arange(MAXP) for b in range(B)]).astype(np.int32)
    page_tables = jnp.asarray(pt)
    scale = 0.11

    # jnp reference path
    from zhilight_tpu.kvcache.paged import KVCache, gather_latent

    cache = KVCache(latent=(pool,), page_size=S)

    class _m:
        kv_lora_rank = lora
        qk_rope_head_dim = rope_d

    ctx = gather_latent(cache, 0, page_tables)
    want = M._mla_decode(q_nope, q_pe, ctx, w_uk, w_uv, context_lens, scale, _m)

    q_latent = jnp.einsum("bhn,lhn->bhl", q_nope, w_uk)
    q_eff = jnp.concatenate([q_latent, q_pe], axis=-1)
    out_latent = paged_mla_decode(
        q_eff, pool, page_tables, context_lens, S, scale, v_dim=lora, interpret=True
    )
    got = jnp.einsum("bhl,lhv->bhv", out_latent, w_uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
