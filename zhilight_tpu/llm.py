"""Top-level model entry point.

Parity: reference ``zhilight.LLaMA`` wrapper (zhilight/llama.py:114-245) and
``AutoModel`` dispatch (zhilight/models/auto_model.py): build config via
adapters, load tokenizer + weights, construct the executor. Works from an HF
model directory or from in-memory (config, params) for tests.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax

from .config import EngineConfig, ModelConfig, QuantConfig, load_model_config
from .engine.engine import ModelExecutor
from .engine.generator import DynamicBatchGenerator
from .engine.scheduler import Scheduler
from .utils.hf_loader import load_hf_state

logger = logging.getLogger(__name__)

__all__ = ["LLM"]


def _load_generation_eos(model_path: str) -> list:
    """EOS id(s) from HF generation_config.json (int or list)."""
    import json
    import os

    path = os.path.join(model_path, "generation_config.json")
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            raw = json.load(f).get("eos_token_id")
    except Exception:  # pragma: no cover
        return []
    if raw is None:
        return []
    return [int(x) for x in (raw if isinstance(raw, list) else [raw])]


class LLM:
    def __init__(
        self,
        model_path: str = "",
        engine_config: Optional[EngineConfig] = None,
        model_config: Optional[ModelConfig] = None,
        quant_config: Optional[QuantConfig] = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer=None,
        mesh=None,
    ):
        self.engine_config = engine_config or EngineConfig(model_path=model_path)
        # multi-host: must precede every backend-initializing JAX call
        from .parallel.mesh import ensure_distributed

        ensure_distributed(self.engine_config.parallel)
        if model_path:
            cfg, qcfg, raw = load_model_config(model_path)
            self.model_config = model_config or cfg
            self.quant_config = quant_config or qcfg
            self.hf_config = raw
        else:
            assert model_config is not None, "need model_path or model_config"
            self.model_config = model_config
            self.quant_config = quant_config or QuantConfig()
            self.hf_config = {}

        self.tokenizer = tokenizer
        if model_path and tokenizer is None:
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(model_path, trust_remote_code=True)
            except Exception as e:  # pragma: no cover
                logger.warning("tokenizer load failed: %s", e)

        if params is None:
            assert model_path, "need params or model_path"
            params = load_hf_state(
                model_path, self.model_config, quant=self.quant_config
            )
            from .config.quant_config import QuantType

            if self.quant_config.quant_type == QuantType.AUTO_INT8:
                # quantize raw fp16/bf16 weights to W8A8 at load (reference
                # AutoInt8, linear.cpp:432-630); for the calibrated
                # SmoothQuant variant use LLM.load_with_smooth_quant
                from .utils.quant_convert import quantize_int8_params

                params = quantize_int8_params(params, alpha=self.quant_config.smooth_alpha)
        # default EOS set: tokenizer eos + generation_config.json lists
        # (e.g. Llama-3 ships eos_token_id=[eos, eot_id]; reference users had
        # to pass stop_token_ids manually — here any member stops generation)
        eos_ids: list = []
        if self.tokenizer is not None and getattr(self.tokenizer, "eos_token_id", None) is not None:
            eos_ids.append(int(self.tokenizer.eos_token_id))
        for gen_eos in (_load_generation_eos(model_path) if model_path else []):
            if gen_eos not in eos_ids:
                eos_ids.append(gen_eos)
        if eos_ids:
            sched = self.engine_config.scheduler
            if sched.eos_id != eos_ids[0] or tuple(eos_ids) != sched.eos_ids:
                import dataclasses

                self.engine_config = dataclasses.replace(
                    self.engine_config,
                    scheduler=dataclasses.replace(
                        sched, eos_id=eos_ids[0], eos_ids=tuple(eos_ids)
                    ),
                )

        self.executor = ModelExecutor(self.model_config, params, self.engine_config, mesh=mesh)

    def generator(self) -> DynamicBatchGenerator:
        return DynamicBatchGenerator(self)

    # ------------------------------------------------------------------
    # SmoothQuant calibration (reference LLaMA.calc_act_scales +
    # load_with_smooth_quant, /root/reference/zhilight/llama.py:214-240,
    # src/model/model_context.h:95-99)
    # ------------------------------------------------------------------
    def calc_act_scales(self, prompts, calib_len: int = 512):
        """Run calibration prompts through the model and return per-channel
        activation |max| per quantized-linear input (path -> [in] float32).
        Prompts are tiled/truncated to ``calib_len`` so one jitted pass
        serves every sample."""
        import numpy as np

        from .utils.calibrate import calc_act_scales as _calc

        batches = []
        for p in prompts:
            ids = self._encode_ids(p)
            if len(ids) == 0:
                continue
            reps = -(-calib_len // len(ids))
            batches.append(np.tile(ids, reps)[:calib_len])
        if not batches:
            raise ValueError("no non-empty calibration prompts")
        return _calc(
            self.executor.params, self.model_config, self.executor.rope, batches
        )

    @classmethod
    def load_with_smooth_quant(
        cls,
        model_path: str,
        calibration_prompts,
        engine_config: Optional[EngineConfig] = None,
        alpha: float = 0.5,
        calib_len: int = 512,
        **kw,
    ) -> "LLM":
        """Full SmoothQuant flow from a raw fp16/bf16 checkpoint: load bf16,
        calibrate activation scales on ``calibration_prompts``, migrate
        outliers into the weights (alpha) and serve W8A8 int8 (reference
        load_with_smooth_quant)."""
        import jax

        from .utils.quant_convert import quantize_int8_params

        base = cls(model_path=model_path, engine_config=engine_config, **kw)
        scales = base.calc_act_scales(calibration_prompts, calib_len=calib_len)
        host_params = jax.device_get(base.executor.params)
        mc, ec, tok = base.model_config, base.engine_config, base.tokenizer
        base.executor = None  # release device weights + KV before rebuild
        del base
        qparams = quantize_int8_params(host_params, scales, alpha)
        return cls(
            model_config=mc, engine_config=ec, params=qparams, tokenizer=tok
        )

    # ------------------------------------------------------------------
    # scoring utilities (reference LLaMA::calc_* APIs, src/model/llama.h:100-131
    # and the zhilight.LLaMA Python surface exercised by tests/test_log_prob.py)
    # ------------------------------------------------------------------
    def _encode_ids(self, tokens):
        if isinstance(tokens, str):
            if self.tokenizer is None:
                raise ValueError("no tokenizer for string input")
            tokens = self.tokenizer.encode(tokens)
        import numpy as np

        return np.asarray(list(tokens), dtype=np.int32)

    def calc_logits(self, tokens):
        """Per-position vocab logits [T, vocab] (fp32 numpy)."""
        return self.executor.run_score(self._encode_ids(tokens))

    def calc_hidden_states(self, tokens):
        """Per-position last-layer (final-norm) hidden states [T, dim]
        (reference output_hidden_states surface)."""
        return self.executor.run_hidden(self._encode_ids(tokens))

    def calc_log_prob(self, tokens, labels=None):
        """(total_logprob, per_position list): log p(labels[i] | tokens[:i+1]).

        With default labels (next-token), position i scores tokens[i+1]."""
        import numpy as np

        ids = self._encode_ids(tokens)
        logits = self.executor.run_score(ids)
        logp = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1, keepdims=True)) - logits.max(-1, keepdims=True)
        if labels is None:
            lab = ids[1:]
            rows = logp[:-1]
        else:
            lab = np.asarray(list(labels), dtype=np.int32)
            rows = logp[: len(lab)]
        per = rows[np.arange(len(lab)), lab]
        return float(per.sum()), per.tolist()

    def calc_loss(self, tokens, labels=None) -> float:
        """Mean next-token cross-entropy (reference calc_loss)."""
        total, per = self.calc_log_prob(tokens, labels)
        return float(-total / max(len(per), 1))

    def calc_greedy_match(self, tokens, labels=None) -> int:
        """Count of positions where argmax(logits) == label
        (reference calc_greedy_match)."""
        import numpy as np

        ids = self._encode_ids(tokens)
        logits = self.executor.run_score(ids)
        if labels is None:
            lab = ids[1:]
            rows = logits[:-1]
        else:
            lab = np.asarray(list(labels), dtype=np.int32)
            rows = logits[: len(lab)]
        return int(np.sum(np.argmax(rows, axis=-1) == lab))
