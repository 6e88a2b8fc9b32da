"""Quantized linear runtime paths.

Parity targets in the reference:
  - Int8Linear W8A8 (SmoothQuant / AbsMax), src/nn/linear/linear.cpp:432-630 +
    activation quant kernels (src/nn/quant/int8/)
  - Int4GPTQ / AWQ W4A16 fused dequant GEMMs (src/nn/quant/gptq/, quant/awq/,
    quant/marlin/)
  - Fp8Linear / Fp8Block 128x128 block-scaled GEMM (src/nn/quant/fp8/,
    3rd/deep_gemm)

Canonical on-device formats (produced by utils/quant_convert.py at load):
  int8:  {"w_q": int8 [in, out], "scale": f32 [out], "smooth"?: f32 [in]}
  int4:  {"w_p": int8 [in, out] nibble values 0..15,
          "scales": f32 [groups, out], "zeros": f32 [groups, out]}
  fp8:   {"w_f8": float8_e4m3fn [in, out],
          "scale": f32 [] | [out] | "block_scale": f32 [in/B, out/B]}

XLA paths here are the correctness reference; the fused Pallas kernels in
``ops/pallas/quant_matmul.py`` take over on TPU for the hot shapes.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["int8_linear", "int4_linear", "fp8_linear", "quantize_int8_weight", "pack_int4", "unpack_int4"]


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu" and os.environ.get("ZT_NO_PALLAS") != "1"


# ---------------------------------------------------------------------------
# INT8
# ---------------------------------------------------------------------------

def quantize_int8_weight(w: jax.Array):
    """Per-output-channel absmax int8 quantization (reference AutoInt8 load
    path). w [in, out] -> (w_q int8, scale f32 [out])."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quantize_act_per_token(x: jax.Array):
    """Dynamic per-token absmax int8 activation quantization (reference
    per-token activation quant, src/nn/quant/int8/activation kernels)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """W8A8: smooth-scale x, dynamic per-token int8 quant, int8xint8 MXU dot
    with int32 accumulation, then rescale."""
    if "smooth" in p:
        x = x * p["smooth"].astype(x.dtype)
    x_q, x_scale = _quantize_act_per_token(x)
    acc = jax.lax.dot_general(
        x_q,
        p["w_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p["scale"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# INT4 (GPTQ / AWQ)
# ---------------------------------------------------------------------------

def int4_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """W4A16 groupwise dequant + matmul.

    XLA reference path dequantizes the weight to the activation dtype and
    relies on fusion; the Pallas fused kernel dequantizes per-tile in VMEM.
    """
    Kw = p["w_p"].shape[-2] * (2 if p["w_p"].dtype == jnp.uint8 else 1)
    if x.shape[-1] < Kw:
        # loader padded K to a 2*gs multiple (zero-scale groups, see
        # hf_loader._pad_canon_int4): zero-pad the activation columns
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kw - x.shape[-1])])
    if "perm" in p:
        # GPTQ act_order (desc_act=true): the loader sorted the weight rows so
        # each quant group is contiguous (utils/quant_convert.unpack_gptq);
        # activations must be gathered with the same permutation. The gather
        # moves O(M*K) activation bytes — negligible against the K*N/2-byte
        # weight read (reference handles this in the exllama q_gemm path,
        # src/nn/quant/gptq/ + zhilight/loader.py:199-244).
        x = jnp.take(x, p["perm"], axis=-1)
    if _use_pallas():
        from .pallas.quant_matmul import w4a16_matmul

        return w4a16_matmul(x, p["w_p"], p["scales"], p["zeros"])
    w = dequant_int4(p["w_p"], p["scales"], p["zeros"], x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# On-wire packed-int4 format version. v2 = global-planar with the high plane
# stored XOR 8 (MXU bitcast encoding); v1 (pre-XOR) is no longer produced.
# Every independent producer of this layout (utils/quant_convert.
# gptq_planar_qweight) must match pack_int4 bit-for-bit and assert against
# this constant so a silent encoding change fails loudly instead of
# dequantizing persisted/external artifacts into garbage weights.
INT4_PACK_FORMAT = 2


def pack_int4(w_nib: jax.Array) -> jax.Array:
    """Pack nibble weights [K, N] (values 0..15, int8) into uint8 [K/2, N]:
    GLOBAL-PLANAR layout — low nibbles hold rows [0, K/2), high nibbles rows
    [K/2, K) stored XOR 8 (= value - 8 mod 16). Tile-agnostic: any packed
    k-tile unpacks to two original-row ranges, so the fused kernel reads
    4 bits/weight from HBM (Marlin-class; the reference reads packed int4
    too, gptq_marlin.cu) and pairs each half with its own activation block.
    The XOR-8 encoding lets the kernel feed ``bitcast_i8(byte & 0xF0)``
    (= 16 * (value - 8)) straight to the MXU with zero per-weight VPU work —
    see pallas/quant_matmul._w4a16_packed_kernel."""
    K = w_nib.shape[0]
    lo = w_nib[: K // 2].astype(jnp.uint8)
    hi = w_nib[K // 2 :].astype(jnp.uint8) ^ 8
    return lo | (hi << 4)


def unpack_int4(w_packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: uint8 [K/2, N] -> int8 nibbles [K, N]."""
    lo = (w_packed & 0xF).astype(jnp.int8)
    hi = ((w_packed >> 4) ^ 8).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def dequant_int4(w_p: jax.Array, scales: jax.Array, zeros: jax.Array, dtype) -> jax.Array:
    """w_p [in, out] nibbles (int8) or packed uint8 [in/2, out];
    scales/zeros [groups, out]; group = in/groups rows."""
    if w_p.dtype == jnp.uint8:
        w_p = unpack_int4(w_p)
    K, N = w_p.shape
    G = scales.shape[0]
    gs = K // G
    wf = w_p.astype(jnp.float32).reshape(G, gs, N)
    w = (wf - zeros[:, None, :]) * scales[:, None, :]
    return w.reshape(K, N).astype(dtype)


# ---------------------------------------------------------------------------
# FP8
# ---------------------------------------------------------------------------

def fp8_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """FP8 weight GEMM: per-tensor/channel scale or 128x128 block scales
    (DeepSeek fp8-block / deep_gemm class). The XLA dequant path materializes
    a bf16 weight copy in HBM (measured 9.65 bytes/weight on v5e,
    tools/probe_fp8.py), so block-scaled weights route to the fused Pallas
    kernel on TPU (1 byte/weight streamed, dequant in VMEM)."""
    w = p["w_f8"]
    if "block_scale" in p:
        bs = p["block_scale"]  # [in/B, out/B]
        K, N = w.shape
        if (
            _use_pallas()
            and K % 128 == 0
            and N % 128 == 0
            and bs.shape == (K // 128, N // 128)
        ):
            from .pallas.fp8_matmul import fp8_block_matmul

            return fp8_block_matmul(x, w, bs)
        Bk = K // bs.shape[0]
        Bn = N // bs.shape[1]
        wf = w.astype(jnp.float32).reshape(bs.shape[0], Bk, bs.shape[1], Bn)
        wf = wf * bs[:, None, :, None]
        w_deq = wf.reshape(K, N).astype(x.dtype)
    else:
        w_deq = (w.astype(jnp.float32) * p["scale"]).astype(x.dtype)
    return jnp.dot(x, w_deq, preferred_element_type=jnp.float32).astype(x.dtype)
