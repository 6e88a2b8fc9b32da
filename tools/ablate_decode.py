"""Ablation timing of the decode step on the real chip: which component eats
the time (projections / attention kernel / KV write / lm_head)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zhilight_tpu.config import ModelConfig
from zhilight_tpu.kvcache import new_kv_cache, write_kv
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta
from zhilight_tpu.ops.pallas.paged_attention import paged_decode_attention

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


def bench(name, fn, *args, donate=(), steps=20):
    f = jax.jit(fn, donate_argnums=donate)
    out = f(*args)
    jax.block_until_ready(out)
    # rebuild donated args
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(*args) if not donate else None
        if donate:
            break
    if not donate:
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / steps
        print(f"{name:30s} {dt*1000:8.2f} ms")
    return out


# 1. full decode step
def full_step(params, tokens, cache, meta):
    logits, cache2 = L.forward_decode(params, cfg, rope, tokens, meta, cache)
    return jnp.argmax(logits, -1)

f = jax.jit(full_step)
r = f(params, tokens, cache, meta); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20):
    r = f(params, tokens, cache, meta)
jax.block_until_ready(r); print(f"{'full step (no donate)':30s} {(time.perf_counter()-t0)/20*1000:8.2f} ms")

# 2. matmuls only (no attention, no cache writes)
def mlp_only(params, x):
    for i in range(cfg.num_layers):
        p = params["layers"][str(i)]
        from zhilight_tpu.ops.linear import linear
        from zhilight_tpu.ops.norms import rms_norm
        h = rms_norm(x, p["ln_attn"]["w"], cfg.eps)
        q = linear(p["attn"]["q_proj"], h); k = linear(p["attn"]["k_proj"], h); v = linear(p["attn"]["v_proj"], h)
        x = x + linear(p["attn"]["o_proj"], q)
        h = rms_norm(x, p["ln_ff"]["w"], cfg.eps)
        x = x + L.dense_mlp(p["mlp"], cfg, h)
    return L.get_logits(params, cfg, x).argmax(-1)

x0 = jnp.zeros((BATCH, cfg.dim_model), cfg.jax_dtype)
bench("matmuls+lmhead only", mlp_only, params, x0)

# 3. attention kernel alone x40 layers
def attn_only(q, cache, meta):
    outs = []
    for i in range(cfg.num_layers):
        outs.append(paged_decode_attention(q, cache.k[i], cache.v[i], meta.page_tables, meta.context_lens, 0.125))
    return sum(outs)

q = jnp.zeros((BATCH, cfg.num_heads, cfg.dim_head), cfg.jax_dtype)
bench("paged attention x40", attn_only, q, cache, meta)

# 4. kv writes alone x40
def writes_only(cache, meta, k_new):
    for i in range(cfg.num_layers):
        cache = write_kv(cache, i, k_new, k_new, meta.slot_mapping)
    return cache.k[0][0, 0, 0, 0]

k_new = jnp.zeros((BATCH, cfg.num_kv_heads, cfg.dim_head), cfg.jax_dtype)
bench("kv writes x40", writes_only, cache, meta, k_new)

# 5. lm_head alone
def lmhead(params, x):
    return L.get_logits(params, cfg, x).argmax(-1)
bench("lm_head+argmax", lmhead, params, x0)
