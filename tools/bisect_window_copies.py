"""Bisect the XLA layout/defensive copies inside the decode-window loop.

Round-1 finding: the production decode_multi window pays ~23 ms/step (40
layers) in copy ops the single-step program doesn't have; a simplified
no-sampler no-format-pin loop had zero. This builds the window with feature
toggles and profiles each variant on the chip:

  bare      argmax feedback, no sampler state, no pins, no per-step outputs
  +ys       ... with per-step stacked outputs (scan ys)
  +sampler  ... with sample_step + SamplerState carry (greedy)
  +pins     ... with Format-pinned out_shardings on cache (+state)
  full      everything (== production decode_multi, greedy)

Run on the chip (ZT_BISECT_LAYERS sets depth; default 4 to bound compiles).
"""

import functools
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax-comp-cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.config import ModelConfig
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta
from zhilight_tpu.ops.sampling import (
    SamplerState,
    SamplingParams,
    new_sampler_state,
    sample_step,
)

LAYERS = int(os.environ.get("ZT_BISECT_LAYERS", "4"))
cfg = ModelConfig(
    model_type="cpm_dragonfly", num_layers=LAYERS, dim_model=2304, num_heads=36,
    dim_head=64, num_kv_heads=36, dim_ff=5760, vocab_size=122753,
    dtype="bfloat16", scale_emb=12.0, scale_depth=1.4, dim_model_base=256,
    tie_lm_head=True,
)
BATCH, PAGE, CTX, K = 16, 16, 512, 8
MAX_PAGES = CTX // PAGE + 2
rope = L.build_rope(cfg)
params = L.init_params(cfg, jax.random.PRNGKey(0))


def fmt_tree(tree):
    from jax.experimental import layout as XL

    def fmt(x):
        return XL.Format(
            XL.Layout(major_to_minor=tuple(range(x.ndim))), x.sharding
        )

    return jax.tree.map(fmt, tree)


def build(with_ys, with_sampler, with_pins):
    cache = new_kv_cache(
        cfg.num_layers, BATCH * MAX_PAGES, PAGE, cfg.num_kv_heads, cfg.dim_head
    )
    state = new_sampler_state(BATCH, cfg.vocab_size)
    sparams = SamplingParams.greedy(BATCH)
    key = jax.random.PRNGKey(0)

    S = PAGE

    def body_factory():
        def body(carry, _):
            tokens, cache, state, positions, context_lens = carry
            page = jnp.take_along_axis(
                carry_pt, (positions // S)[:, None], axis=1
            )[:, 0]
            slot = page * S + positions % S
            meta = DecodeMeta(
                positions=positions,
                slot_mapping=slot,
                page_tables=carry_pt,
                context_lens=context_lens,
            )
            logits, cache2 = L.forward_decode(params, cfg, rope, tokens, meta, cache)
            if with_sampler:
                tok, lp, toplp, toptok, state2 = sample_step(
                    logits.astype(jnp.float32), state, sparams, key,
                    num_logprobs=0, greedy_only=True,
                )
            else:
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                lp = jnp.zeros((BATCH,), jnp.float32)
                state2 = state
            new_carry = (tok, cache2, state2, positions + 1, context_lens + 1)
            if with_ys:
                return new_carry, (tok, lp)
            return new_carry, None

        return body

    page_tables = np.stack(
        [b * MAX_PAGES + np.arange(MAX_PAGES) for b in range(BATCH)]
    ).astype(np.int32)
    carry_pt = jnp.asarray(page_tables)

    def loop(tokens, cache, state, positions, context_lens):
        carry = (tokens, cache, state, positions, context_lens)
        carry, ys = jax.lax.scan(body_factory(), carry, None, length=K, unroll=2)
        if with_ys:
            return carry + (ys,)
        return carry

    kw = {}
    if with_pins:
        # pin cache (+state) output formats like the production engine does;
        # plain sharding (layout unconstrained) for the small outputs
        dev_sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        outs = (dev_sh, fmt_tree(cache), fmt_tree(state), dev_sh, dev_sh)
        if with_ys:
            outs = outs + ((dev_sh, dev_sh),)
        kw["out_shardings"] = outs

    step = jax.jit(loop, donate_argnums=(1, 2), **kw)

    tokens = jnp.zeros((BATCH,), jnp.int32)
    positions = jnp.full((BATCH,), CTX - 1, jnp.int32)
    context_lens = jnp.full((BATCH,), CTX, jnp.int32)
    return step, (tokens, cache, state, positions, context_lens)


def profile(name, step, args):
    out = step(*args)
    jax.block_until_ready(out)
    # keep donated state flowing like production
    args = (out[0], out[1], out[2], out[3], out[4])
    trace_dir = f"/tmp/jax-trace-bisect"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = step(*args)
            args = (out[0], out[1], out[2], out[3], out[4])
        jax.block_until_ready(out)

    from xprof.convert import raw_to_tool_data as r2t

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    obj = json.loads(bytes(data).decode())
    table = obj[0]
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]]
    dev = [r for r in rows if r.get("host_or_device") == "Device"]
    agg = defaultdict(float)
    for r in dev:
        fam = re.sub(r"[.\d]+$", "", str(r["operation"]))
        agg[fam] += float(r["total_self_time"])
    total = sum(agg.values()) / 3000 / K
    copies = sum(t for n, t in agg.items() if "copy" in n) / 3000 / K
    pallas = sum(t for n, t in agg.items() if "pallas" in n) / 3000 / K
    print(
        f"{name:12s} total {total:7.3f} ms/step  copies {copies:7.3f}  "
        f"pallas {pallas:7.3f}",
        flush=True,
    )
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:6]
    for n, t in top:
        print(f"    {t/3000/K:8.3f} ms/step  {n[:70]}", flush=True)


# production always pins output formats (load-bearing: 213->23 tok/s
# without them); unpinned programs also compile pathologically slowly
# (>35 min vs minutes), so the bisect holds pins fixed and varies the
# loop contents instead: (ys, sampler, pins)
VARIANTS = {
    "full": (True, True, True),
    "noys": (False, True, True),
    "nosampler": (True, False, True),
    "plain": (False, False, True),
    "bare": (False, False, False),
}

if __name__ == "__main__":
    print("backend:", jax.default_backend(), "layers:", LAYERS, flush=True)
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        ys, sampler, pins = VARIANTS[name]
        try:
            print(f"[{name}] building + compiling ...", flush=True)
            step, args = build(ys, sampler, pins)
            profile(name, step, args)
        except Exception as e:
            print(f"{name:12s} FAILED: {str(e)[:200]}", flush=True)
