"""Pipeline-parallel stage placement (models/pipeline.py) vs single-device.

Runs on a pp=2 mesh of virtual CPU devices; stage 0 holds layers [0, L/2),
stage 1 the rest, the KV pool is split at the same boundary, and decode
logits must match the plain per-layer forward bit-for-bit (float32 CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zhilight_tpu.config import ModelConfig
from zhilight_tpu.kvcache import new_kv_cache
from zhilight_tpu.models import llama as L
from zhilight_tpu.models import pipeline as PP
from zhilight_tpu.models.base import DecodeMeta, PrefillMeta

VOCAB = 64
PAGE, MAXP = 4, 8


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        model_type="llama", num_layers=4, dim_model=32, num_heads=4, dim_head=8,
        num_kv_heads=2, dim_ff=64, vocab_size=VOCAB, dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def _mesh(pp):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    return Mesh(np.array(jax.devices()[:pp]), (PP.PP_AXIS,))


def _prefill_ref(cfg, params, rope, prompt):
    """Prefill on the per-layer path; returns (last logits, per-layer cache,
    page table) so the pp decode step starts from identical KV state."""
    n = len(prompt)
    BUCKET = 16
    cache = new_kv_cache(cfg.num_layers, MAXP, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    tok = np.zeros(BUCKET, np.int32); tok[:n] = prompt
    pos = np.zeros(BUCKET, np.int32); pos[:n] = np.arange(n)
    slots = np.full(BUCKET, -1, np.int32); slots[:n] = np.arange(n)
    pt = np.full(MAXP, -1, np.int32)
    pt[: (n + PAGE - 1) // PAGE] = np.arange((n + PAGE - 1) // PAGE)
    meta = PrefillMeta(
        positions=jnp.asarray(pos), slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(pt), cache_len=jnp.int32(0), q_len=jnp.int32(n),
    )
    logits, cache = L.forward_prefill(params, cfg, rope, jnp.asarray(tok), meta, cache)
    return logits, cache, pt


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_decode_matches_single_device(model, pp):
    cfg, params = model
    mesh = _mesh(pp)
    rope = L.build_rope(cfg)
    rng = np.random.RandomState(1)
    prompt = list(rng.randint(2, VOCAB, size=9))
    n = len(prompt)

    logits0, cache_ref, pt = _prefill_ref(cfg, params, rope, prompt)
    tok1 = jnp.asarray([int(np.argmax(np.asarray(logits0)))], jnp.int32)
    dmeta = DecodeMeta(
        positions=jnp.asarray([n], jnp.int32),
        slot_mapping=jnp.asarray([n], jnp.int32),
        page_tables=jnp.asarray(pt)[None],
        context_lens=jnp.asarray([n + 1], jnp.int32),
    )
    ref_logits, cache_ref = L.forward_decode(params, cfg, rope, tok1, dmeta, cache_ref)

    # pp cache: one layer-major pool, seeded from the per-layer pools so both
    # paths decode against identical KV state (before tok1's row)
    pp_params = PP.shard_params_pp(cfg, params, mesh)
    k = jnp.concatenate([cache_ref.k[i] for i in range(cfg.num_layers)], axis=0)
    v = jnp.concatenate([cache_ref.v[i] for i in range(cfg.num_layers)], axis=0)
    sh = NamedSharding(mesh, P(PP.PP_AXIS))
    from zhilight_tpu.kvcache.paged import KVCache
    cache_pp = KVCache(
        k=(jax.device_put(k, sh),), v=(jax.device_put(v, sh),),
        latent=None, k_scale=None, v_scale=None,
        page_size=PAGE, packed=False,
    )

    pp_logits, cache_pp = PP.forward_decode_pp(
        pp_params, cfg, rope, tok1, dmeta, cache_pp, mesh
    )
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )

    # the written KV rows must land layer-major in the pp pool
    slots_per_layer = MAXP * PAGE
    got_k = np.asarray(cache_pp.k[0])
    for layer in range(cfg.num_layers):
        np.testing.assert_allclose(
            got_k[layer * slots_per_layer + n],
            np.asarray(cache_ref.k[layer][n]),
            rtol=1e-5, atol=1e-5,
        )
    # second decode step keeps matching (state round-trips through the pp pool)
    tok2 = jnp.asarray([int(np.argmax(np.asarray(ref_logits)))], jnp.int32)
    dmeta2 = DecodeMeta(
        positions=jnp.asarray([n + 1], jnp.int32),
        slot_mapping=jnp.asarray([n + 1], jnp.int32),
        page_tables=jnp.asarray(pt)[None],
        context_lens=jnp.asarray([n + 2], jnp.int32),
    )
    ref2, _ = L.forward_decode(params, cfg, rope, tok2, dmeta2, cache_ref)
    pp2, _ = PP.forward_decode_pp(pp_params, cfg, rope, tok2, dmeta2, cache_pp, mesh)
    np.testing.assert_allclose(np.asarray(pp2), np.asarray(ref2), rtol=1e-4, atol=1e-4)


def test_pp_prefill_then_decode(model):
    """End-to-end on the pp path alone: prefill an empty pp pool, decode one
    step, compare logits against the single-device per-layer forward."""
    cfg, params = model
    mesh = _mesh(2)
    rope = L.build_rope(cfg)
    rng = np.random.RandomState(2)
    prompt = list(rng.randint(2, VOCAB, size=7))
    n = len(prompt)

    ref_logits, cache_ref, pt = _prefill_ref(cfg, params, rope, prompt)

    pp_params = PP.shard_params_pp(cfg, params, mesh)
    from zhilight_tpu.kvcache import new_kv_cache as _new
    from zhilight_tpu.kvcache.paged import KVCache
    base = _new(1, MAXP * cfg.num_layers, PAGE, cfg.num_kv_heads, cfg.dim_head, jnp.float32)
    sh = NamedSharding(mesh, P(PP.PP_AXIS))
    cache_pp = KVCache(
        k=(jax.device_put(base.k[0], sh),), v=(jax.device_put(base.v[0], sh),),
        latent=None, k_scale=None, v_scale=None, page_size=PAGE, packed=False,
    )

    BUCKET = 16
    tok = np.zeros(BUCKET, np.int32); tok[:n] = prompt
    pos = np.zeros(BUCKET, np.int32); pos[:n] = np.arange(n)
    slots = np.full(BUCKET, -1, np.int32); slots[:n] = np.arange(n)
    meta = PrefillMeta(
        positions=jnp.asarray(pos), slot_mapping=jnp.asarray(slots),
        page_table=jnp.asarray(pt), cache_len=jnp.int32(0), q_len=jnp.int32(n),
    )
    pp_logits, cache_pp = PP.forward_prefill_pp(
        pp_params, cfg, rope, jnp.asarray(tok), meta, cache_pp, mesh
    )
    np.testing.assert_allclose(
        np.asarray(pp_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
    )

    tok1 = jnp.asarray([int(np.argmax(np.asarray(ref_logits)))], jnp.int32)
    dmeta = DecodeMeta(
        positions=jnp.asarray([n], jnp.int32),
        slot_mapping=jnp.asarray([n], jnp.int32),
        page_tables=jnp.asarray(pt)[None],
        context_lens=jnp.asarray([n + 1], jnp.int32),
    )
    ref_d, _ = L.forward_decode(params, cfg, rope, tok1, dmeta, cache_ref)
    pp_d, _ = PP.forward_decode_pp(pp_params, cfg, rope, tok1, dmeta, cache_pp, mesh)
    np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d), rtol=1e-4, atol=1e-4)
