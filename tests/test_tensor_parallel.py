"""Tensor/expert-parallel correctness on the 8-virtual-device CPU mesh:
sharded execution must produce the same logits as single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from zhilight_tpu.config import ModelConfig, MoEConfig
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models.base import DecodeMeta, PrefillMeta
from zhilight_tpu.parallel import TP_AXIS, make_mesh, pspec_tree, shard_params

PAGE = 4
MAXP = 8
T_BUCKET = 16


def make_cfg(moe=False):
    kw = dict(
        model_type="llama",
        num_layers=2,
        dim_model=64,
        num_heads=8,
        dim_head=8,
        num_kv_heads=4,
        dim_ff=128,
        vocab_size=128,
        dtype="float32",
    )
    if moe:
        kw["moe"] = MoEConfig(num_experts=4, top_k=2, intermediate_size=64)
    return ModelConfig(**kw)


def run_forward(cfg, params, cache, tokens, mesh=None):
    rope = L.build_rope(cfg)
    n = len(tokens)
    tok = np.zeros(T_BUCKET, np.int32)
    tok[:n] = tokens
    pos = np.zeros(T_BUCKET, np.int32)
    pos[:n] = np.arange(n)
    slots = np.full(T_BUCKET, -1, np.int32)
    slots[:n] = np.arange(n)
    pt = np.full(MAXP, -1, np.int32)
    pt[: (n + PAGE - 1) // PAGE] = np.arange((n + PAGE - 1) // PAGE)
    meta = PrefillMeta(
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(pt),
        cache_len=jnp.int32(0),
        q_len=jnp.int32(n),
    )
    fn = jax.jit(lambda pr, tk, mt, ca: L.forward_prefill(pr, cfg, rope, tk, mt, ca))
    if mesh is not None:
        with mesh:
            logits, cache = fn(params, jnp.asarray(tok), meta, cache)
    else:
        logits, cache = fn(params, jnp.asarray(tok), meta, cache)

    # one decode step too
    p2 = np.full((2, MAXP), -1, np.int32)
    p2[0, : n // PAGE + 1] = np.arange(n // PAGE + 1)
    dmeta = DecodeMeta(
        positions=jnp.asarray([n, 0], jnp.int32),
        slot_mapping=jnp.asarray([n, -1], jnp.int32),
        page_tables=jnp.asarray(p2),
        context_lens=jnp.asarray([n + 1, 0], jnp.int32),
    )
    dfn = jax.jit(lambda pr, tk, mt, ca: L.forward_decode(pr, cfg, rope, tk, mt, ca))
    dtok = jnp.asarray([int(np.argmax(np.asarray(logits))), 0], jnp.int32)
    if mesh is not None:
        with mesh:
            dlogits, _ = dfn(params, dtok, dmeta, cache)
    else:
        dlogits, _ = dfn(params, dtok, dmeta, cache)
    return np.asarray(logits), np.asarray(dlogits[0])


@pytest.mark.parametrize("moe", [False, True], ids=["dense", "moe"])
def test_tp_matches_single_device(moe):
    cfg = make_cfg(moe)
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, cfg.vocab_size, size=11)

    cache1 = new_kv_cache(cfg.num_layers, 32, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    ref_logits, ref_dlogits = run_forward(cfg, params, cache1, tokens)

    mesh = make_mesh(tp=4, dp=1, devices=jax.devices()[:4])
    sharded = shard_params(params, mesh)
    cache2 = new_kv_cache(cfg.num_layers, 32, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    kv_spec = NamedSharding(mesh, P(None, TP_AXIS, None))
    cache2 = jax.tree.map(lambda x: jax.device_put(x, kv_spec), cache2)

    tp_logits, tp_dlogits = run_forward(cfg, sharded, cache2, tokens, mesh=mesh)

    np.testing.assert_allclose(tp_logits, ref_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tp_dlogits, ref_dlogits, rtol=2e-4, atol=2e-4)


def test_pspec_rules():
    cfg = make_cfg(moe=True)
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    specs = pspec_tree(params)
    assert specs["layers"]["0"]["attn"]["q_proj"]["w"] == P(None, TP_AXIS)
    assert specs["layers"]["0"]["attn"]["o_proj"]["w"] == P(TP_AXIS, None)
    assert specs["layers"]["0"]["mlp"]["experts"]["gate_proj"]["w"] == P(TP_AXIS, None, None)
    assert specs["layers"]["0"]["ln_attn"]["w"] == P()
    assert specs["embedding"]["w"] == P(TP_AXIS, None)
