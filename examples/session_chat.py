"""Incremental multi-turn session with KV reuse
(reference zhilight/session_generator.py usage)."""

import os
import sys

# runnable straight from a checkout (no install step)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg, SessionGenerator
from zhilight_tpu.llm import LLM


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    args = ap.parse_args()

    llm = LLM(args.model_path)
    tok = llm.tokenizer
    with DynamicBatchGenerator(llm) as gen:
        with SessionGenerator(gen) as sess:
            for turn in ["Hi, who are you?", "What can you do?"]:
                ids = tok.encode(turn)
                res = sess.generate(ids, GeneratorArg(max_length=64))
                print(f">>> {turn}\n{res.outputs[0].text}\n")


if __name__ == "__main__":
    main()
