"""Linear layer facade with weight-format dispatch.

Parity target: reference ``nn::Linear`` facade over NormalLinear / Int8Linear /
Fp8Linear / Fp8Block / Int4GPTQ / GPTQMarlin / AWQ impls
(src/nn/linear/linear.cpp:130-140). Here the format is encoded by which keys a
parameter sub-dict carries, so one functional entry point serves all formats
and quantized formats plug in as Pallas kernels:

  {"w": [in, out], "b"?: [out]}                          — bf16/fp16 dense
  {"w_q": int8 [in, out], "scale": [out], "b"?}          — weight-only int8
  {"w_q": int8, "scale", "act_scale"}                    — W8A8 SmoothQuant
  {"w_p": packed int4, "scales", "zeros"?, "g_idx"?}     — GPTQ/AWQ W4A16
  {"w_f8": fp8, "block_scale": [in/128, out/128]}        — FP8 block (DeepSeek)

Matmuls run on the MXU in the input dtype with fp32 accumulation
(reference HIGH_PRECISION gemm option, 3rd/bmengine functions/gemm.cpp).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["linear"]


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    if "w" in p:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    elif "w_q" in p:
        from .quant import int8_linear

        y = int8_linear(p, x)
    elif "w_p" in p:
        from .quant import int4_linear

        y = int4_linear(p, x)
    elif "w_f8" in p:
        from .quant import fp8_linear

        y = fp8_linear(p, x)
    else:
        raise ValueError(f"unknown linear param format: {sorted(p.keys())}")
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
