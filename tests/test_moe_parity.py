"""MoE model parity vs HF transformers (Mixtral, Qwen2-MoE tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import adapt_hf_config
from tests.test_model_parity import hf_reference_logits, run_engine
from zhilight_tpu.utils.hf_loader import map_hf_params


def mixtral_cfg():
    return dict(
        model_type="mixtral",
        num_hidden_layers=2,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        vocab_size=128,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        rope_theta=10000.0,
        torch_dtype="float32",
        hidden_act="silu",
        tie_word_embeddings=False,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=None,
    )


def qwen2_moe_cfg():
    return dict(
        model_type="qwen2_moe",
        num_hidden_layers=2,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=96,
        vocab_size=128,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        rope_theta=10000.0,
        torch_dtype="float32",
        hidden_act="silu",
        tie_word_embeddings=False,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        use_sliding_window=False,
    )


@pytest.mark.parametrize("make_cfg", [mixtral_cfg, qwen2_moe_cfg], ids=["mixtral", "qwen2_moe"])
def test_moe_parity(make_cfg):
    hf_cfg = make_cfg()
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, hf_cfg["vocab_size"], size=14).astype(np.int32)

    state, ref_logits = hf_reference_logits(hf_cfg, tokens)
    cfg = adapt_hf_config(hf_cfg).replace(dtype="float32")
    params = map_hf_params(state.items(), cfg, dtype=jnp.float32, strict=False)
    if cfg.tie_lm_head and "lm_head" in params:
        del params["lm_head"]

    got = run_engine(cfg, params, tokens)
    want = ref_logits[len(tokens) - 4 :]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
