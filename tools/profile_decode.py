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

GEOM = os.environ.get("ZT_PROFILE_GEOM", "minicpm")
if GEOM == "llama8b":
    cfg = ModelConfig(
        model_type="llama", num_layers=32, dim_model=4096, num_heads=32,
        dim_head=128, num_kv_heads=8, dim_ff=14336, vocab_size=32768,
        dtype="bfloat16",
    )
else:
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

# summarize from the xplane (the chrome json truncates at 1M host events)
import json as _json

from xprof.convert import raw_to_tool_data as r2t

files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
assert files, "no trace written"
data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
obj = _json.loads(bytes(data).decode())
table = obj[0] if isinstance(obj, list) else obj
cols = [c["id"] for c in table["cols"]]
rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
dev = [r for r in rows if r.get("host_or_device") == "Device"]
from collections import defaultdict as _dd

agg = _dd(float)
cnt = _dd(float)
for r in dev:
    name = re.sub(r"[.\d]+$", "", str(r["operation"]))
    agg[name] += float(r["total_self_time"])  # microseconds
    cnt[name] += float(r["occurrences"])
tot = sum(agg.values())
print(f"total device self time: {tot/3000:.2f} ms/step")
for n, t in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
    print(f"{t/3000:8.3f} ms/step x{cnt[n]/3:<6.0f} {n[:80]}")
