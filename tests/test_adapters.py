"""HF config.json adaptation smoke tests per model family.

Regression: _adapt_minicpm passed tie_lm_head both via _base_fields and
explicitly -> TypeError, breaking every MiniCPM checkpoint load from disk.
"""

from zhilight_tpu.config import adapt_hf_config


def test_minicpm_adapter_from_disk_config():
    # shape of tools/make_bench_model.py minicpm-2b config.json (matches
    # openbmb/MiniCPM-2B-sft-bf16)
    cfg = adapt_hf_config(
        dict(
            model_type="minicpm",
            hidden_size=2304,
            intermediate_size=5760,
            num_hidden_layers=40,
            num_attention_heads=36,
            num_key_value_heads=36,
            vocab_size=122753,
            max_position_embeddings=4096,
            rope_theta=10000.0,
            rms_norm_eps=1e-5,
            tie_word_embeddings=True,
            scale_emb=12,
            dim_model_base=256,
            scale_depth=1.4,
        )
    )
    assert cfg.model_type == "minicpm"
    assert cfg.tie_lm_head is True
    assert cfg.scale_emb == 12.0
    assert cfg.scale_depth == 1.4
    assert cfg.dim_model_base == 256


def test_minicpm_defaults_tie_when_field_absent():
    cfg = adapt_hf_config(
        dict(
            model_type="cpm_dragonfly",
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            vocab_size=128,
        )
    )
    assert cfg.tie_lm_head is True


def test_qwen2_adapter():
    cfg = adapt_hf_config(
        dict(
            model_type="qwen2",
            hidden_size=5120,
            intermediate_size=13824,
            num_hidden_layers=48,
            num_attention_heads=40,
            num_key_value_heads=8,
            vocab_size=152064,
            rope_theta=1000000.0,
        )
    )
    assert cfg.num_kv_heads == 8
    assert cfg.rope_theta == 1000000.0
