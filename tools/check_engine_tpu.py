"""On-chip engine integration check: greedy generation on the TPU must match
the CPU engine exactly (same tiny float32 model, same prompts).

Run:  python tools/check_engine_tpu.py            # on the chip
      JAX_PLATFORMS=cpu python tools/check_engine_tpu.py --expected-only
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

ap = argparse.ArgumentParser()
ap.add_argument("--expected-only", action="store_true")
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu or args.expected_only:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

if args.cpu or args.expected_only:
    # the axon sitecustomize preloads jax with the TPU plugin pinned;
    # env vars alone don't override it
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from zhilight_tpu.config import CacheConfig, EngineConfig, ModelConfig, SchedulerConfig
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L

VOCAB = 64

GEOMS = {
    # slot-major pools (dim_head 32: unpacked) — the original check
    "d32": dict(dim_head=32, num_heads=8, dim_model=256),
    # packed head-major pools (dim_head 64) — exercises the decode-window
    # side-buffer path (window-batched KV writes) on the chip
    "d64": dict(dim_head=64, num_heads=4, dim_model=256),
}

print("backend:", jax.default_backend())
for name, g in GEOMS.items():
    cfg = ModelConfig(
        model_type="llama", num_layers=2, num_kv_heads=4, dim_ff=512,
        vocab_size=VOCAB, dtype="float32", **g,
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ecfg = EngineConfig(
        max_model_len=128,
        cache=CacheConfig(page_size=16, num_pages=64),
        scheduler=SchedulerConfig(
            max_batch=4, chunk_size=32, prefill_buckets=(32, 64), eos_id=1
        ),
    )
    llm = LLM(model_config=cfg, params=params, engine_config=ecfg)

    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(2, VOCAB, size=n)) for n in (7, 19, 41)]
    with DynamicBatchGenerator(llm) as gen:
        results = gen.batch_generate(prompts, GeneratorArg(max_length=12))
    got = [r.outputs[0].token_ids for r in results]
    print(name, json.dumps(got))
