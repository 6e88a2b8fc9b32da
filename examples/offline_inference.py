"""Offline batched inference (reference examples/offline_inference.py)."""

import os
import sys

# runnable straight from a checkout (no install step)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    ap.add_argument("--max-tokens", type=int, default=128)
    args = ap.parse_args()

    llm = LLM(args.model_path)
    prompts = [
        "San Francisco is a",
        "The capital of France is",
        "The future of AI is",
    ]
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(
            prompts, GeneratorArg(max_length=args.max_tokens, temperature=0.7, top_p=0.95)
        )
    for p, r in zip(prompts, results):
        print(f"Prompt: {p!r}\nGenerated: {r.outputs[0].text!r}\n")


if __name__ == "__main__":
    main()
