"""Scoring utilities + hidden-states output.

Covers the reference's calc_logits / calc_log_prob / output_hidden_states
surfaces (zhilight LLaMAInferenceResults + RequestResult.hidden_states):

    python examples/scoring_and_hidden_states.py /path/to/hf-model "some text"
"""

import sys

sys.path.insert(0, ".")

from zhilight_tpu.engine import GeneratorArg
from zhilight_tpu.llm import LLM


def main():
    model_path = sys.argv[1]
    text = sys.argv[2] if len(sys.argv) > 2 else "The capital of France is"

    llm = LLM(model_path)

    # per-position logits / log-probs
    total, per = llm.calc_log_prob(text)
    print(f"log p(text) = {total:.3f}  ({len(per)} scored positions)")

    # last-layer hidden states (embedding extraction)
    hs = llm.calc_hidden_states(text)
    print(f"hidden states: {hs.shape} (mean-pooled embedding: {hs.mean(0)[:4]}...)")

    # hidden states alongside generation
    with llm.generator() as gen:
        res = gen.generate(
            text, GeneratorArg(max_length=16, output_hidden_states=True)
        )
    out = res.outputs[0]
    print("generated:", out.text)
    print("hidden states for prompt+output:", res.hidden_states[0].shape)


if __name__ == "__main__":
    main()
