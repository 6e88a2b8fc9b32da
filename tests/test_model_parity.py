"""Logit parity of the JAX model vs HF transformers (CPU, fp32).

Mirrors the reference test strategy (tests/test_attention.py etc.: construct
the engine layer, load identical random weights, compare vs a torch reference)
but end-to-end: full prefill + paged decode vs HF full-context forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import ModelConfig, adapt_hf_config
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models.base import DecodeMeta, PrefillMeta
from zhilight_tpu.models import llama as L
from zhilight_tpu.utils.hf_loader import map_hf_params

PAGE = 4
MAX_PAGES = 8
T_BUCKET = 16


def tiny_hf_cfg(**kw):
    base = dict(
        model_type="llama",
        num_hidden_layers=2,
        hidden_size=64,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=112,
        vocab_size=128,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        rope_theta=10000.0,
        torch_dtype="float32",
        hidden_act="silu",
        tie_word_embeddings=False,
    )
    base.update(kw)
    return base


def hf_reference_logits(hf_cfg: dict, tokens: np.ndarray):
    """Build an HF model from config, return (state_dict numpy, logits [T, V])."""
    torch = pytest.importorskip("torch")
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(**hf_cfg)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg)
    model = model.to(torch.float32).eval()
    with torch.no_grad():
        out = model(torch.from_numpy(tokens)[None].long())
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    return state, out.logits[0].float().numpy()


def run_engine(cfg: ModelConfig, params, tokens: np.ndarray):
    """Prefill the whole prompt then teacher-forced paged decode; returns
    per-position logits for positions [prompt_len-1 ... len(tokens)-1]."""
    rope = L.build_rope(cfg)
    if cfg.mla.enabled:
        from zhilight_tpu.kvcache import new_latent_cache

        cache = new_latent_cache(cfg.num_layers, 32, PAGE, cfg.mla.latent_dim, jnp.float32)
    else:
        cache = new_kv_cache(cfg.num_layers, 32, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)

    prefill_fn = jax.jit(lambda pr, tk, mt, ca: L.forward_prefill(pr, cfg, rope, tk, mt, ca))
    decode_fn = jax.jit(lambda pr, tk, mt, ca: L.forward_decode(pr, cfg, rope, tk, mt, ca))

    prompt_len = len(tokens) - 3
    pages = list(range(MAX_PAGES))  # identity page table: slot = position

    def slot(pos):
        return pages[pos // PAGE] * PAGE + pos % PAGE

    tok_pad = np.zeros(T_BUCKET, np.int32)
    tok_pad[:prompt_len] = tokens[:prompt_len]
    positions = np.zeros(T_BUCKET, np.int32)
    positions[:prompt_len] = np.arange(prompt_len)
    slots = np.full(T_BUCKET, -1, np.int32)
    slots[:prompt_len] = [slot(p) for p in range(prompt_len)]
    page_table = np.full(MAX_PAGES, -1, np.int32)
    used = (prompt_len + PAGE - 1) // PAGE
    page_table[:used] = pages[:used]

    meta = PrefillMeta(
        positions=jnp.asarray(positions),
        slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(page_table),
        cache_len=jnp.int32(0),
        q_len=jnp.int32(prompt_len),
    )
    logits, cache = prefill_fn(params, jnp.asarray(tok_pad), meta, cache)
    outs = [np.asarray(logits)]

    # decode steps, teacher-forced with the true next tokens, batch of 2 slots
    # (slot 1 inactive) to exercise masking
    B = 2
    for i, pos in enumerate(range(prompt_len, len(tokens))):
        page_tables = np.full((B, MAX_PAGES), -1, np.int32)
        used = pos // PAGE + 1
        page_tables[0, :used] = pages[:used]
        dmeta = DecodeMeta(
            positions=jnp.asarray([pos, 0], jnp.int32),
            slot_mapping=jnp.asarray([slot(pos), -1], jnp.int32),
            page_tables=jnp.asarray(page_tables),
            context_lens=jnp.asarray([pos + 1, 0], jnp.int32),
        )
        step_tokens = jnp.asarray([tokens[pos], 0], jnp.int32)
        dlogits, cache = decode_fn(params, step_tokens, dmeta, cache)
        outs.append(np.asarray(dlogits[0]))
    return np.stack(outs)


@pytest.mark.parametrize(
    "hf_kw",
    [
        {},  # llama
        {"tie_word_embeddings": True},
        {"model_type": "qwen2", "attention_bias": True},
        {
            "model_type": "qwen3",
            "head_dim": 16,
        },
        {
            "model_type": "llama",
            "rope_scaling": {
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
        },
        {
            "model_type": "llama",
            "rope_scaling": {"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 64},
        },
    ],
    ids=["llama", "tied", "qwen2", "qwen3", "llama3-rope", "yarn"],
)
def test_dense_parity(hf_kw):
    hf_cfg = tiny_hf_cfg(**hf_kw)
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


def test_dense_parity_packed_pool():
    """dim_head=64: the KV pool is head-major lane-packed, exercising the
    packed XLA-fallback write (mid-dim scatter) and gather paths on CPU
    against the independent HF reference."""
    hf_cfg = tiny_hf_cfg(hidden_size=256, num_attention_heads=4, num_key_value_heads=2)
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, hf_cfg["vocab_size"], size=14).astype(np.int32)

    state, ref_logits = hf_reference_logits(hf_cfg, tokens)
    cfg = adapt_hf_config(hf_cfg).replace(dtype="float32")
    assert cfg.dim_head == 64
    params = map_hf_params(state.items(), cfg, dtype=jnp.float32, strict=False)

    from zhilight_tpu.kvcache import new_kv_cache as _new

    cache = _new(cfg.num_layers, 32, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    assert cache.packed and cache.k[0].shape[0] == cfg.num_kv_heads

    got = run_engine(cfg, params, tokens)
    want = ref_logits[len(tokens) - 4 :]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
