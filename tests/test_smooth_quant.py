"""SmoothQuant calibration -> W8A8 quantization -> serving accuracy.

Parity target: the reference calibration flow ``calc_act_scales`` +
``load_with_smooth_quant`` (/root/reference/zhilight/llama.py:214-240,
src/model/model_context.h:95-99): compute per-channel activation maxima on
calibration text, migrate outliers into the weights, serve W8A8 int8 from a
raw fp16/bf16 checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zhilight_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from zhilight_tpu.engine import DynamicBatchGenerator, GeneratorArg
from zhilight_tpu.llm import LLM
from zhilight_tpu.models import llama as L
from zhilight_tpu.utils.calibrate import calc_act_scales
from zhilight_tpu.utils.quant_convert import quantize_int8_params

VOCAB = 64


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        model_type="llama",
        num_layers=2,
        dim_model=64,
        num_heads=4,
        dim_head=16,
        num_kv_heads=2,
        dim_ff=128,
        vocab_size=VOCAB,
        dtype="float32",
    )
    params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def _ecfg(**kw):
    return EngineConfig(
        max_model_len=64,
        cache=CacheConfig(page_size=4, num_pages=64),
        scheduler=SchedulerConfig(max_batch=2, chunk_size=16, prefill_buckets=(16, 32), eos_id=1),
    )


def test_calc_act_scales_shapes(model):
    cfg, params = model
    rope = L.build_rope(cfg)
    batches = [np.random.RandomState(0).randint(2, VOCAB, size=24).astype(np.int32)]
    scales = calc_act_scales(params, cfg, rope, batches)
    # one entry per linear input site: q/k/v/o + gate/up/down per layer
    assert len(scales) == cfg.num_layers * 7
    assert scales["layers.0.attn.q_proj"].shape == (cfg.dim_model,)
    assert scales["layers.0.mlp.down_proj"].shape == (cfg.dim_ff,)
    assert all((v > 0).all() for v in scales.values())


def test_smooth_quant_end_to_end(model):
    """calibrate -> quantize -> logits stay close to bf16; smooth vectors
    actually stored; greedy generation runs through the engine."""
    cfg, params = model
    rope = L.build_rope(cfg)
    rng = np.random.RandomState(1)
    calib = [rng.randint(2, VOCAB, size=32).astype(np.int32) for _ in range(3)]
    scales = calc_act_scales(params, cfg, rope, calib)

    qparams = quantize_int8_params(jax.device_get(params), scales, alpha=0.5)
    l0 = qparams["layers"]["0"]["attn"]["q_proj"]
    assert l0["w_q"].dtype == jnp.int8
    assert "smooth" in l0 and l0["smooth"].shape == (cfg.dim_model,)

    llm_fp = LLM(model_config=cfg, params=params, engine_config=_ecfg())
    llm_q = LLM(model_config=cfg, params=qparams, engine_config=_ecfg())

    probe = rng.randint(2, VOCAB, size=20).astype(np.int32)
    ref = llm_fp.calc_logits(probe)
    got = llm_q.calc_logits(probe)
    # W8A8 with per-token dynamic activation quant: logits agree closely
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert err < 0.08, err

    with DynamicBatchGenerator(llm_q) as gen:
        res = gen.generate(list(probe[:8]), GeneratorArg(max_length=4))
    assert len(res.outputs[0].token_ids) >= 1


def test_plain_auto_int8_no_calibration(model):
    """quantize_int8_params without act_scales = reference AutoInt8."""
    cfg, params = model
    qparams = quantize_int8_params(jax.device_get(params))
    l0 = qparams["layers"]["0"]["mlp"]["down_proj"]
    assert l0["w_q"].dtype == jnp.int8 and "smooth" not in l0
    # untouched leaves
    assert "w" in qparams["embedding"]
    llm_q = LLM(model_config=cfg, params=qparams, engine_config=_ecfg())
    probe = np.arange(2, 12, dtype=np.int32)
    out = llm_q.calc_logits(probe)
    assert np.isfinite(out).all()
