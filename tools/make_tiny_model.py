"""Create a tiny random HF-format llama checkpoint + tokenizer for offline
smoke tests and server verification (no network needed).

Usage: python tools/make_tiny_model.py /tmp/tiny-llama [model_type]
"""

import json
import os
import sys


def write_tokenizer(path: str) -> int:
    """Byte-level BPE tokenizer built from scratch; returns vocab size."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = ["hello world how are you today " * 4, "the quick brown fox jumps over the lazy dog"]
    tok.train_from_iterator(corpus, trainer)
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "chat_template": "{% for m in messages %}{{ m['content'] }}{% endfor %}",
            },
            f,
        )
    return tok.get_vocab_size()


def make(path: str, model_type: str = "llama"):
    os.makedirs(path, exist_ok=True)
    vocab_size = write_tokenizer(path)

    # -- model --------------------------------------------------------------
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    cfg = AutoConfig.for_model(
        model_type,
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=2048,
        rms_norm_eps=1e-6,
        bos_token_id=0,
        eos_token_id=1,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg)
    model.save_pretrained(path, safe_serialization=True)
    print(f"wrote tiny {model_type} (vocab={vocab_size}) to {path}")


if __name__ == "__main__":
    make(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny-llama",
         sys.argv[2] if len(sys.argv) > 2 else "llama")
