"""Profile one decode step on the real chip and print the top device ops.

Writes a chrome trace via jax.profiler and summarizes op durations.
"""

import glob
import re
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.config import ModelConfig
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta

cfg = ModelConfig(
    model_type="cpm_dragonfly", num_layers=40, dim_model=2304, num_heads=36,
    dim_head=64, num_kv_heads=36, dim_ff=5760, vocab_size=122753,
    dtype="bfloat16", scale_emb=12.0, scale_depth=1.4, dim_model_base=256,
    tie_lm_head=True,
)
BATCH, PAGE, CTX = 16, 16, 512
MAX_PAGES = CTX // PAGE
rope = L.build_rope(cfg)
params = L.init_params(cfg, jax.random.PRNGKey(0))
cache = new_kv_cache(cfg.num_layers, BATCH * MAX_PAGES, PAGE, cfg.num_kv_heads, cfg.dim_head)

pos = CTX - 1
page_tables = np.stack([b * MAX_PAGES + np.arange(MAX_PAGES) for b in range(BATCH)]).astype(np.int32)
meta = DecodeMeta(
    positions=jnp.full((BATCH,), pos, jnp.int32),
    slot_mapping=jnp.asarray(page_tables[:, pos // PAGE] * PAGE + pos % PAGE, jnp.int32),
    page_tables=jnp.asarray(page_tables),
    context_lens=jnp.full((BATCH,), CTX, jnp.int32),
)
tokens = jnp.zeros((BATCH,), jnp.int32)


import functools


@functools.partial(jax.jit, donate_argnums=(2,))
def full_step(params, tokens, cache, meta):
    logits, cache = L.forward_decode(params, cfg, rope, tokens, meta, cache)
    return jnp.argmax(logits, -1).astype(jnp.int32), cache


f = full_step
tokens, cache = f(params, tokens, cache, meta)
jax.block_until_ready(tokens)

trace_dir = "/tmp/jax-trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        tokens, cache = f(params, tokens, cache, meta)
    jax.block_until_ready(tokens)

# summarize chrome trace events
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
assert files, "no trace written"
with gzip.open(files[0], "rt") as fh:
    trace = json.load(fh)

# find device-op events (TensorFlow Op / XLA Ops track)
durs = defaultdict(float)
cnt = defaultdict(int)
pid_names = {}
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pid_names[ev["pid"]] = ev["args"].get("name", "")
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X":
        continue
    pname = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname:
        continue
    name = ev.get("name", "")
    name = re.sub(r"[.\d]+$", "", name)  # aggregate fusion.123 -> fusion
    durs[name] += ev.get("dur", 0)
    cnt[name] += 1

total = sum(durs.values())
print(f"total device-op time over 3 steps: {total/1000:.2f} ms  ({total/3000:.2f} ms/step)")
for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{d/3000:9.3f} ms/step  x{cnt[name]//3:<5d} {name[:100]}")
