"""Beam search with multiple results (reference beam flow)."""

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
    args = ap.parse_args()

    llm = LLM(args.model_path)
    with DynamicBatchGenerator(llm) as gen:
        res = gen.generate(
            "Translate to French: good morning",
            GeneratorArg(beam_size=4, num_results=2, max_length=32),
        )
    for i, out in enumerate(res.outputs):
        print(f"[{i}] score={out.score:.3f}: {out.text!r}")


if __name__ == "__main__":
    main()
