"""Plain-task TPOT with a beam task active: mixed K=1 vs segregated windows.

r4 measured mixed beam+plain windows costing plain tasks ~2-3x TPOT (the
whole batch drops to K=1 for host-side beam reorders). ZT_BEAM_SEGREGATE=1
runs a full-K window over plain slots (beams frozen) + a K=1 beam step per
iteration instead. This probe measures both on the real chip and prints one
JSON line per mode.

Usage: python tools/probe_beam_mix.py --model-path /tmp/minicpm2b
       (run once per mode; the scheduler reads the env per decode step, so
        --segregate toggles in-process)
"""

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import numpy as np


def run_mode(gen, rng, segregate: bool, n_plain=6, out_len=96):
    from zhilight_tpu.engine import GeneratorArg

    if segregate:
        os.environ["ZT_BEAM_SEGREGATE"] = "1"
    else:
        os.environ.pop("ZT_BEAM_SEGREGATE", None)

    results = {}

    def plain(i):
        ids = rng.randint(10, 30000, size=128).tolist()
        res = gen.generate(ids, GeneratorArg(max_length=out_len, temperature=0.0))
        results[f"plain{i}"] = res.outputs[0]

    def beam():
        ids = rng.randint(10, 30000, size=128).tolist()
        res = gen.generate(
            ids, GeneratorArg(max_length=out_len, beam_size=2, temperature=1.0)
        )
        results["beam"] = res.outputs[0]

    threads = [threading.Thread(target=plain, args=(i,)) for i in range(n_plain)]
    threads.append(threading.Thread(target=beam))
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    def tpot_ms(o):
        gen_s = max(1e-6, o.time_elapsed - o.first_token_delay)
        return gen_s / max(1, len(o.token_ids) - 1) * 1e3

    tpots = [tpot_ms(results[f"plain{i}"]) for i in range(n_plain)]
    return {
        "mode": "segregated" if segregate else "mixed",
        "plain_tpot_mean_ms": round(float(np.mean(tpots)), 2),
        "plain_tpot_max_ms": round(float(np.max(tpots)), 2),
        "beam_tpot_ms": round(tpot_ms(results["beam"]), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default="/tmp/minicpm2b")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from zhilight_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from zhilight_tpu.llm import LLM

    ecfg = EngineConfig(
        model_path=args.model_path,
        max_model_len=512,
        cache=CacheConfig(page_size=16),
        scheduler=SchedulerConfig(max_batch=args.batch, chunk_size=512),
    )
    llm = LLM(model_path=args.model_path, engine_config=ecfg)
    gen = llm.generator().start()
    rng = np.random.RandomState(0)

    # warm both program shapes
    run_mode(gen, rng, segregate=False, n_plain=2, out_len=16)
    run_mode(gen, rng, segregate=True, n_plain=2, out_len=16)

    for seg in (False, True):
        print(json.dumps(run_mode(gen, rng, seg)), flush=True)
    gen.stop()


if __name__ == "__main__":
    main()
