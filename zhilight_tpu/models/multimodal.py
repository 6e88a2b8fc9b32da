"""Multimodal front-ends: vision embeddings computed host-side, injected into
the TPU engine as ``input_embeddings``.

Parity: reference ``DeepseekVL2(LLaMA)`` (zhilight/models/deepseek_vl_v2.py:
63-136) — the HF processor + torch vision tower run on host exactly as the
reference does (its vision path is torch too); only the language model runs
on the accelerator, fed precomputed embeddings and custom position ids
through ``SearchTask.input_embeddings``.
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional

import numpy as np

from ..engine.task import GeneratorArg

logger = logging.getLogger(__name__)

__all__ = ["DeepseekVL2", "is_customized_model"]


def is_customized_model(hf_config: dict) -> bool:
    """Reference AutoModel dispatch (zhilight/models/auto_model.py:28)."""
    return hf_config.get("model_type", "") in ("deepseek_vl_v2",)


class DeepseekVL2:
    """DeepSeek-VL2: torch vision encoder + TPU language model.

    Usage:
        llm = LLM(model_path)                      # language weights on TPU
        vl = DeepseekVL2(llm, model_path)
        out = vl.generate(conversation, images, arg)
    """

    def __init__(self, llm, model_path: str):
        self.llm = llm
        self.model_path = model_path
        self._processor = None
        self._vision = None

    def _ensure_vision(self):
        if self._processor is not None:
            return
        try:
            import torch  # noqa: F401
            from transformers import AutoModelForCausalLM, AutoProcessor

            self._processor = AutoProcessor.from_pretrained(
                self.model_path, trust_remote_code=True
            )
            self._vision = AutoModelForCausalLM.from_pretrained(
                self.model_path, trust_remote_code=True
            )
            # Drop the torch language model: only the vision tower + projector
            # run host-side; text-token embeddings come from the TPU-resident
            # table via a shim (reference nulls `vl_gpt.language` and rebinds
            # it to a ModelAdapter over its own engine,
            # zhilight/models/deepseek_vl_v2.py:90,117-118).
            self._strip_language(self._vision)
        except Exception as e:  # pragma: no cover - needs model assets
            raise RuntimeError(
                f"DeepseekVL2 vision tower unavailable: {e}. The vision encoder "
                "runs in torch on host (same as the reference); install the "
                "model's remote code and weights."
            ) from e

    def _strip_language(self, model):
        """Replace the loaded torch language model with a TPU-backed embedding
        shim and free its weights (they are duplicated on the accelerator)."""
        import gc

        import torch

        llm = self.llm

        class _TPUEmbedding(torch.nn.Module):
            """Token-id -> embedding lookup served from the engine's
            (sharded, device-resident) embedding table."""

            def forward(self, input_ids: "torch.Tensor") -> "torch.Tensor":
                import numpy as _np

                ids = input_ids.detach().cpu().numpy().astype(_np.int32)
                w = llm.executor.params["embedding"]["w"]
                emb = _np.asarray(w[ids.reshape(-1)], dtype=_np.float32)
                emb = emb.reshape(*ids.shape, emb.shape[-1])
                return torch.from_numpy(emb)

        class _LanguageShim(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.embed = _TPUEmbedding()

            def get_input_embeddings(self):
                return self.embed

        for name in ("language", "language_model"):
            if hasattr(model, name) and getattr(model, name) is not None:
                setattr(model, name, _LanguageShim())
                break
        gc.collect()

    def compute_embeddings(self, conversation: List[dict], images: List[Any]):
        """Returns (input_ids, input_embeddings [T, dim], position_ids)."""
        self._ensure_vision()
        import torch

        prepared = self._processor(
            conversations=conversation, images=images, force_batchify=True
        )
        with torch.no_grad():
            emb = self._vision.prepare_inputs_embeds(**prepared)  # type: ignore[attr-defined]
        input_ids = prepared["input_ids"][0].tolist()
        emb_np = emb[0].float().cpu().numpy()
        position_ids = np.arange(len(input_ids), dtype=np.int32)
        return input_ids, emb_np, position_ids

    def generate(
        self,
        conversation: List[dict],
        images: List[Any],
        arg: Optional[GeneratorArg] = None,
        generator=None,
    ):
        input_ids, emb, pos = self.compute_embeddings(conversation, images)
        gen = generator or self.llm.generator().start()
        return gen.generate(
            input_ids, arg or GeneratorArg(), input_embeddings=emb, position_ids=pos
        )
