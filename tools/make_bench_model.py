"""Generate a FULL-SIZE random-weight HF checkpoint for serving benchmarks.

The reference's headline numbers are end-to-end serving runs on real model
geometries (BASELINE.md: MiniCPM-2B bf16, Qwen2.5-14B GPTQ-Int4, ...). Real
weights are unavailable offline, so this writes random weights in the exact
on-disk format (sharded safetensors, HF config.json incl. quantization_config,
tokenizer) at the real geometry — the full loader/convert/serving path then
runs unmodified and perf is identical to a real checkpoint (same shapes,
dtypes, and kernels; only the logit values are garbage).

Usage:
    python tools/make_bench_model.py qwen2.5-14b-gptq /tmp/qwen14b-gptq
    python tools/make_bench_model.py minicpm-2b      /tmp/minicpm2b
    python tools/make_bench_model.py qwen2.5-14b-gptq /tmp/q14 --layers 4  # smoke
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# geometry presets: HF config fields (matching the public checkpoints'
# config.json) + which preset quantizes
PRESETS = {
    # Qwen/Qwen2.5-14B-Instruct-GPTQ-Int4 (BASELINE row: QPS 0.57 on 2xAD102)
    "qwen2.5-14b-gptq": dict(
        model_type="qwen2",
        hidden_size=5120,
        intermediate_size=13824,
        num_hidden_layers=48,
        num_attention_heads=40,
        num_key_value_heads=8,
        vocab_size=152064,
        max_position_embeddings=32768,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_bias=True,
        gptq=dict(bits=4, group_size=128, desc_act=False, sym=True),
    ),
    # Qwen/Qwen2-7B-Instruct-GPTQ-Int4
    "qwen2-7b-gptq": dict(
        model_type="qwen2",
        hidden_size=3584,
        intermediate_size=18944,
        num_hidden_layers=28,
        num_attention_heads=28,
        num_key_value_heads=4,
        vocab_size=152064,
        max_position_embeddings=32768,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_bias=True,
        gptq=dict(bits=4, group_size=128, desc_act=False, sym=True),
    ),
    # openbmb/MiniCPM-2B-sft-bf16 (BASELINE row: QPS 1.67 on 1xAD102)
    "minicpm-2b": dict(
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
        attn_bias=False,
        gptq=None,
    ),
    # deepseek-ai/DeepSeek-V2-Lite geometry with GPTQ-Int4 expert stacks —
    # the single-chip stand-in for the reference's flagship DeepSeek-R1 AWQ
    # row (docs/benchmarks/benchmarks.md:27-45): exercises MLA (latent cache,
    # absorbed decode) + fine-grained MoE (64 routed + 2 shared experts) +
    # W4A16 quant end-to-end. kv_a/kv_b stay bf16 (absorbed decode composes
    # dequantized kv_b; real AWQ DeepSeek checkpoints likewise keep the MLA
    # low-rank projections unconverted), dense layer-0 mlp stays bf16
    # (10944 % 128 != 0 breaks the g128 layout; 0.13 GB).
    "deepseek-v2-lite-w4": dict(
        model_type="deepseek_v2",
        hidden_size=2048,
        intermediate_size=10944,
        moe_intermediate_size=1408,
        num_hidden_layers=27,
        num_attention_heads=16,
        num_key_value_heads=16,
        n_routed_experts=64,
        n_shared_experts=2,
        num_experts_per_tok=6,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        kv_lora_rank=512,
        q_lora_rank=None,
        qk_nope_head_dim=128,
        qk_rope_head_dim=64,
        v_head_dim=128,
        scoring_func="softmax",
        topk_method="greedy",
        norm_topk_prob=False,
        routed_scaling_factor=1.0,
        vocab_size=102400,
        max_position_embeddings=163840,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_bias=False,
        gptq=dict(bits=4, group_size=128, desc_act=False, sym=True),
        rope_scaling=dict(
            rope_type="yarn",
            factor=40.0,
            beta_fast=32,
            beta_slow=1,
            mscale=0.707,
            mscale_all_dim=0.707,
            original_max_position_embeddings=4096,
        ),
    ),
    # meta-llama/Llama-3.1-8B-Instruct geometry (bf16 row, 2xAD102)
    "llama-3.1-8b": dict(
        model_type="llama",
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        vocab_size=128256,
        max_position_embeddings=131072,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        attn_bias=False,
        gptq=None,
        rope_scaling=dict(
            rope_type="llama3",
            factor=8.0,
            high_freq_factor=4.0,
            low_freq_factor=1.0,
            original_max_position_embeddings=8192,
        ),
    ),
}


class ShardWriter:
    """Accumulate tensors and flush ~2 GB safetensors shards."""

    def __init__(self, path: str, limit=2 << 30):
        self.path = path
        self.limit = limit
        self.buf = {}
        self.size = 0
        self.n = 0

    def add(self, name: str, arr: np.ndarray):
        self.buf[name] = arr
        self.size += arr.nbytes
        if self.size >= self.limit:
            self.flush()

    def flush(self):
        if not self.buf:
            return
        from safetensors.numpy import save_file

        fn = os.path.join(self.path, f"model-{self.n:05d}.safetensors")
        save_file(self.buf, fn)
        print(f"  wrote {fn} ({self.size / 1e9:.2f} GB, {len(self.buf)} tensors)")
        self.buf, self.size = {}, 0
        self.n += 1


def bf16(rng, shape, scale=0.02):
    """Random bf16 via torch (ml_dtypes .astype is per-element slow)."""
    import ml_dtypes
    import torch

    n = int(np.prod(shape))
    g = torch.Generator().manual_seed(int(rng.integers(2**31)))
    t = torch.randn(n, generator=g, dtype=torch.float32).mul_(scale).to(torch.bfloat16)
    return t.view(torch.int16).numpy().view(ml_dtypes.bfloat16).reshape(shape)


def gptq_tensors(rng, K, N, group_size):
    """Random AutoGPTQ-v1-format tensors for a [K, N] linear (column-major
    convention: qweight packs 8 K-rows per int32)."""
    G = K // group_size
    qweight = rng.integers(0, 2**32, size=(K // 8, N), dtype=np.uint32).astype(np.int32)
    # sym: zeros stored as 7 (packed 0x7 nibbles, +1 at unpack => 8)
    qzeros = np.full((G, N // 8), 0x77777777, dtype=np.uint32).astype(np.int32)
    scales = (rng.random((G, N), dtype=np.float32) * 0.004 + 0.001).astype(np.float16)
    g_idx = (np.arange(K, dtype=np.int32) // group_size).astype(np.int32)
    return dict(qweight=qweight, qzeros=qzeros, scales=scales, g_idx=g_idx)


def make(preset_name: str, out: str, layers_override=0):
    p = dict(PRESETS[preset_name])
    if layers_override:
        p["num_hidden_layers"] = layers_override
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)

    H = p["hidden_size"]
    NH = p["num_attention_heads"]
    KV = p["num_key_value_heads"]
    HD = H // NH
    FF = p["intermediate_size"]
    L = p["num_hidden_layers"]
    V = p["vocab_size"]
    gptq = p["gptq"]

    w = ShardWriter(out)
    w.add("model.embed_tokens.weight", bf16(rng, (V, H)))
    if p["model_type"] == "deepseek_v2":
        _make_deepseek_layers(p, w, rng)
        _finish(p, w, out)
        return
    for i in range(L):
        pre = f"model.layers.{i}."
        lin = {
            "self_attn.q_proj": (H, NH * HD),
            "self_attn.k_proj": (H, KV * HD),
            "self_attn.v_proj": (H, KV * HD),
            "self_attn.o_proj": (NH * HD, H),
            "mlp.gate_proj": (H, FF),
            "mlp.up_proj": (H, FF),
            "mlp.down_proj": (FF, H),
        }
        for name, (K, N) in lin.items():
            if gptq:
                for k, v in gptq_tensors(rng, K, N, gptq["group_size"]).items():
                    w.add(pre + name + "." + k, v)
            else:
                w.add(pre + name + ".weight", bf16(rng, (N, K)))  # HF [out, in]
            if p.get("attn_bias") and name.startswith("self_attn.") and name != "self_attn.o_proj":
                w.add(pre + name + ".bias", bf16(rng, (N,)))
        w.add(pre + "input_layernorm.weight", bf16(rng, (H,), scale=0) + 1)
        w.add(pre + "post_attention_layernorm.weight", bf16(rng, (H,), scale=0) + 1)
        if i == 0:
            print(f"layer geometry ok; {L} layers total")
    _finish(p, w, out)


def _make_deepseek_layers(p, w, rng):
    """DeepSeek-V2 layers: MLA attention (GPTQ q/o, bf16 kv_a/kv_b) + MoE
    (GPTQ routed/shared expert stacks, bf16 router) after
    first_k_dense_replace dense layers."""
    H = p["hidden_size"]
    NH = p["num_attention_heads"]
    L = p["num_hidden_layers"]
    FF = p["intermediate_size"]
    MFF = p["moe_intermediate_size"]
    E = p["n_routed_experts"]
    SH = p["n_shared_experts"] * MFF
    lora = p["kv_lora_rank"]
    rope_d = p["qk_rope_head_dim"]
    nope_d = p["qk_nope_head_dim"]
    v_d = p["v_head_dim"]
    gptq = p["gptq"]
    gs = gptq["group_size"]

    def add_lin(name, K, N, quant=True):
        if quant:
            for k, v in gptq_tensors(rng, K, N, gs).items():
                w.add(name + "." + k, v)
        else:
            w.add(name + ".weight", bf16(rng, (N, K)))  # HF [out, in]

    for i in range(L):
        pre = f"model.layers.{i}."
        # MLA attention (q_lora_rank null => direct q_proj)
        add_lin(pre + "self_attn.q_proj", H, NH * (nope_d + rope_d))
        add_lin(pre + "self_attn.kv_a_proj_with_mqa", H, lora + rope_d, quant=False)
        w.add(pre + "self_attn.kv_a_layernorm.weight", bf16(rng, (lora,), scale=0) + 1)
        add_lin(pre + "self_attn.kv_b_proj", lora, NH * (nope_d + v_d), quant=False)
        add_lin(pre + "self_attn.o_proj", NH * v_d, H)
        # mlp: dense for the first first_k_dense_replace layers, MoE after
        if i < p["first_k_dense_replace"]:
            add_lin(pre + "mlp.gate_proj", H, FF, quant=False)
            add_lin(pre + "mlp.up_proj", H, FF, quant=False)
            add_lin(pre + "mlp.down_proj", FF, H, quant=False)
        else:
            w.add(pre + "mlp.gate.weight", bf16(rng, (E, H)))
            for e in range(E):
                epre = pre + f"mlp.experts.{e}."
                add_lin(epre + "gate_proj", H, MFF)
                add_lin(epre + "up_proj", H, MFF)
                add_lin(epre + "down_proj", MFF, H)
            add_lin(pre + "mlp.shared_experts.gate_proj", H, SH)
            add_lin(pre + "mlp.shared_experts.up_proj", H, SH)
            add_lin(pre + "mlp.shared_experts.down_proj", SH, H)
        w.add(pre + "input_layernorm.weight", bf16(rng, (H,), scale=0) + 1)
        w.add(pre + "post_attention_layernorm.weight", bf16(rng, (H,), scale=0) + 1)
        if i == 0:
            print(f"layer geometry ok; {L} layers total")


def _finish(p, w, out):
    H = p["hidden_size"]
    V = p["vocab_size"]
    L = p["num_hidden_layers"]
    gptq = p["gptq"]
    rng = np.random.default_rng(1)
    w.add("model.norm.weight", bf16(rng, (H,), scale=0) + 1)
    if not p["tie_word_embeddings"]:
        w.add("lm_head.weight", bf16(rng, (V, H)))
    w.flush()

    arch = {
        "qwen2": "Qwen2ForCausalLM",
        "llama": "LlamaForCausalLM",
        "minicpm": "MiniCPMForCausalLM",
        "deepseek_v2": "DeepseekV2ForCausalLM",
    }[p["model_type"]]
    cfg = {
        "architectures": [arch],
        "model_type": p["model_type"],
        "hidden_size": H,
        "intermediate_size": p["intermediate_size"],
        "num_hidden_layers": L,
        "num_attention_heads": p["num_attention_heads"],
        "num_key_value_heads": p["num_key_value_heads"],
        "vocab_size": V,
        "max_position_embeddings": p["max_position_embeddings"],
        "rope_theta": p["rope_theta"],
        "rms_norm_eps": p["rms_norm_eps"],
        "tie_word_embeddings": p["tie_word_embeddings"],
        "torch_dtype": "bfloat16",
        "eos_token_id": 2,
        "bos_token_id": 1,
    }
    for k in (
        "scale_emb", "dim_model_base", "scale_depth", "rope_scaling",
        "moe_intermediate_size", "n_routed_experts", "n_shared_experts",
        "num_experts_per_tok", "first_k_dense_replace", "moe_layer_freq",
        "kv_lora_rank", "q_lora_rank", "qk_nope_head_dim", "qk_rope_head_dim",
        "v_head_dim", "scoring_func", "topk_method", "norm_topk_prob",
        "routed_scaling_factor",
    ):
        if k in p:
            cfg[k] = p[k]
    if gptq:
        cfg["quantization_config"] = {
            "quant_method": "gptq",
            "bits": gptq["bits"],
            "group_size": gptq["group_size"],
            "desc_act": gptq["desc_act"],
            "sym": gptq["sym"],
        }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    with open(os.path.join(out, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": 2}, f)

    # tokenizer: reuse the tiny BPE builder (vocab ids stay in range for the
    # random-token-id benchmark client; detok quality is irrelevant)
    from make_tiny_model import write_tokenizer

    write_tokenizer(out)
    print("done:", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", choices=sorted(PRESETS))
    ap.add_argument("out")
    ap.add_argument("--layers", type=int, default=0, help="override layer count (smoke tests)")
    args = ap.parse_args()
    make(args.preset, args.out, args.layers)


if __name__ == "__main__":
    main()
