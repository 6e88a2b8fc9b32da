"""Checkpoint-side quantization conversion (numpy, at load time).

Parity targets:
  - GPTQ/AWQ tensor-dict conversion (reference zhilight/loader.py:199-244
    ``convert_quant_dict`` + the CUDA repack kernels gptq_marlin_repack.cu /
    awq_marlin_repack.cu) — here the packed int32 checkpoint tensors are
    unpacked once into the engine's canonical int4 format (nibble values in
    int8, groupwise f32 scales/zeros) instead of a GPU-specific tile layout;
    the Pallas W4A16 kernel consumes that format directly.
  - AutoInt8 quantize-at-load + SmoothQuant weight scaling
    (reference Int8Linear load path, linear.cpp:432-630).

Packing conventions implemented (验证 by round-trip tests):
  GPTQ v1 (AutoGPTQ): qweight int32 [K/8, N], nibble j = input row i*8+j
    (little-endian); qzeros int32 [G, N/8] with stored value = zero - 1;
    scales [G, N]; optional g_idx [K] for act_order.
  AWQ (AutoAWQ "gemm"): qweight int32 [K, N/8], nibble j = output col
    i*8 + AWQ_ORDER[j] with AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7);
    qzeros same packing, no offset; scales [G, N].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "unpack_gptq",
    "unpack_awq",
    "pack_gptq",
    "pack_awq",
    "convert_quant_tensors",
    "auto_int8_from_fp",
    "smooth_quant_weights",
    "quantize_int8_params",
]

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def _unpack_rows_le(q: np.ndarray) -> np.ndarray:
    """int32 [R, N] -> int8 [R*8, N]: little-endian 4-bit fields along rows.

    Uses torch bitwise kernels: numpy 2.0's broadcast shift/mask runs ~1 M
    elem/s on this host (>100 s per 14B linear); torch does the same op in
    <1 s single-core."""
    import torch

    R, N = q.shape
    tq = torch.from_numpy(np.ascontiguousarray(q))
    out = torch.empty((R, 8, N), dtype=torch.int8)
    for j in range(8):
        out[:, j, :] = (tq >> (4 * j)) & 0xF
    return out.reshape(R * 8, N).numpy()


# ---------------------------------------------------------------------------
# GPTQ
# ---------------------------------------------------------------------------

def unpack_gptq(
    qweight: np.ndarray,  # int32 [K/8, N]
    qzeros: np.ndarray,  # int32 [G, N/8]
    scales: np.ndarray,  # [G, N]
    g_idx: Optional[np.ndarray] = None,  # [K]
) -> Dict[str, np.ndarray]:
    """Returns canonical {"w_p" int8 [K, N], "scales" f32, "zeros" f32, "perm"?}."""
    Kp, N = qweight.shape
    K = Kp * 8
    G = scales.shape[0]

    w_p = _unpack_rows_le(qweight)

    zshifts = (np.arange(8, dtype=np.uint32) * 4)[None, None, :]
    z = ((qzeros.astype(np.uint32)[:, :, None] >> zshifts) & 0xF).reshape(G, -1)
    zeros = (z.astype(np.float32) + 1.0)  # AutoGPTQ v1 stores zero-1

    out = {
        "w_p": w_p,
        "scales": scales.astype(np.float32),
        "zeros": zeros,
    }
    if g_idx is not None and len(g_idx):
        gs = K // G
        expected = np.arange(K) // gs
        if not np.array_equal(g_idx, expected):
            # act_order: permute rows so each group is contiguous; activations
            # must be gathered with the same permutation at runtime
            perm = np.argsort(g_idx, kind="stable")
            out["w_p"] = np.ascontiguousarray(w_p[perm])
            out["perm"] = perm.astype(np.int32)
    return out


_PACK_FORMAT_CHECKED = False


def _assert_pack_format():
    """One-time guard: this module re-derives ops.quant.pack_int4's on-wire
    layout (INT4_PACK_FORMAT) without calling it; verify both the version
    constant and an actual round-trip so a future encoding change in either
    place fails loudly at first conversion instead of producing garbage
    weights."""
    global _PACK_FORMAT_CHECKED
    if _PACK_FORMAT_CHECKED:
        return
    from ..ops.quant import INT4_PACK_FORMAT, pack_int4

    if INT4_PACK_FORMAT != 2:
        raise RuntimeError(
            f"quant_convert implements packed-int4 format v2 but ops.quant "
            f"declares v{INT4_PACK_FORMAT}; update gptq_planar_qweight"
        )
    probe = np.arange(16, dtype=np.int8).reshape(16, 1) % 16
    ours = _planar_pack_reference(probe)
    theirs = np.asarray(pack_int4(probe))
    if not np.array_equal(ours, theirs):
        raise RuntimeError("gptq_planar_qweight layout diverged from pack_int4")
    _PACK_FORMAT_CHECKED = True


def _planar_pack_reference(w_nib: np.ndarray) -> np.ndarray:
    """Numpy mirror of ops.quant.pack_int4 (format v2) for the guard above."""
    K = w_nib.shape[0]
    lo = w_nib[: K // 2].astype(np.uint8)
    hi = w_nib[K // 2 :].astype(np.uint8) ^ 8
    return lo | (hi << 4)


def gptq_planar_qweight(qweight: np.ndarray) -> np.ndarray:
    """GPTQ qweight int32 [K/8, N] -> planar-packed uint8 [K/2, N] directly.

    Same output as ``ops.quant.pack_int4(unpack_gptq(...)["w_p"])`` (low
    nibbles = rows [0, K/2), high = rows [K/2, K)) but without materializing
    the int8 [K, N] intermediate — the checkpoint's 4 bits/weight go straight
    to the kernel's HBM layout, halving host work and device upload. Only
    valid when no act_order row permutation is needed."""
    import torch

    _assert_pack_format()
    Kp, N = qweight.shape  # Kp = K/8
    half = Kp // 2

    def nibbles(q):
        # int32 [half, N] viewed as little-endian bytes [half, N, 4]: byte b
        # of element (k, n) holds original rows 8k+2b (low) and 8k+2b+1 (high)
        b = torch.from_numpy(np.ascontiguousarray(q).view(np.uint8)).reshape(
            half, N, 4
        )
        return b & 0xF, b >> 4

    even_lo, odd_lo = nibbles(qweight[:half])
    even_hi, odd_hi = nibbles(qweight[half:])
    # high plane stored XOR 8 (ops.quant.pack_int4 encoding for the MXU-fed
    # int8 kernel)
    res_even = even_lo | ((even_hi ^ 8) << 4)  # planar rows 8k + {0, 2, 4, 6}
    res_odd = odd_lo | ((odd_hi ^ 8) << 4)  # planar rows 8k + {1, 3, 5, 7}
    out = torch.stack([res_even, res_odd], dim=3)  # [half, N, 4, 2]
    out = out.permute(0, 2, 3, 1).reshape(half * 8, N)
    return out.contiguous().numpy()


def pack_gptq(
    w_p: np.ndarray, zeros: np.ndarray, scales: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of unpack_gptq (used by tests and export)."""
    K, N = w_p.shape
    G = scales.shape[0]
    w = w_p.astype(np.uint32).reshape(K // 8, 8, N)
    qweight = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        qweight |= w[:, j, :] << (4 * j)
    z = (zeros.astype(np.uint32) - 1).reshape(G, N // 8, 8)
    qzeros = np.zeros((G, N // 8), np.uint32)
    for j in range(8):
        qzeros |= z[:, :, j] << (4 * j)
    return qweight.astype(np.int32), qzeros.astype(np.int32), scales


# ---------------------------------------------------------------------------
# AWQ
# ---------------------------------------------------------------------------

def unpack_awq(
    qweight: np.ndarray,  # int32 [K, N/8]
    qzeros: np.ndarray,  # int32 [G, N/8]
    scales: np.ndarray,  # [G, N]
) -> Dict[str, np.ndarray]:
    K, Np = qweight.shape
    N = Np * 8

    def unpack_cols(a):
        import torch

        rows = a.shape[0]
        ta = torch.from_numpy(np.ascontiguousarray(a))
        out = torch.empty((rows, Np, 8), dtype=torch.uint8)
        for j, col in enumerate(AWQ_ORDER):
            out[:, :, col] = (ta >> (4 * j)) & 0xF
        return out.reshape(rows, N).numpy()

    return {
        "w_p": unpack_cols(qweight).astype(np.int8),
        "zeros": unpack_cols(qzeros).astype(np.float32),
        "scales": scales.astype(np.float32),
    }


def pack_awq(
    w_p: np.ndarray, zeros: np.ndarray, scales: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    K, N = w_p.shape

    def pack_cols(a):
        rows = a.shape[0]
        v = a.astype(np.uint32).reshape(rows, N // 8, 8)
        out = np.zeros((rows, N // 8), np.uint32)
        for j, col in enumerate(AWQ_ORDER):
            out |= v[:, :, col] << (4 * j)
        return out.astype(np.int32)

    return pack_cols(w_p), pack_cols(zeros), scales


# ---------------------------------------------------------------------------
# dict-level conversion
# ---------------------------------------------------------------------------

def convert_quant_tensors(
    tensors: Dict[str, np.ndarray], method: str
) -> Optional[Dict[str, np.ndarray]]:
    """Convert one linear's {qweight, qzeros, scales, g_idx?} to canonical."""
    if "qweight" not in tensors:
        return None
    if method == "gptq":
        return unpack_gptq(
            tensors["qweight"],
            tensors["qzeros"],
            tensors["scales"],
            tensors.get("g_idx"),
        )
    if method == "awq":
        return unpack_awq(tensors["qweight"], tensors["qzeros"], tensors["scales"])
    raise ValueError(f"unknown quant method {method!r}")


# ---------------------------------------------------------------------------
# int8 at load
# ---------------------------------------------------------------------------

def auto_int8_from_fp(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-output-channel absmax int8 (reference AutoInt8). w [in, out]."""
    amax = np.abs(w.astype(np.float32)).max(axis=0)
    scale = np.maximum(amax / 127.0, 1e-8).astype(np.float32)
    w_q = np.clip(np.round(w.astype(np.float32) / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "scale": scale}


def smooth_quant_weights(
    w: np.ndarray, act_scale: np.ndarray, alpha: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """SmoothQuant migration (reference load_with_smooth_quant,
    llama.py:214-237): returns (w * s[:, None], 1/s) where
    s = act_scale^alpha / w_colmax^(1-alpha). The runtime multiplies
    activations by the returned "smooth" (= 1/s) vector."""
    w_amax = np.maximum(np.abs(w.astype(np.float32)).max(axis=1), 1e-8)
    s = np.power(np.maximum(act_scale, 1e-8), alpha) / np.power(w_amax, 1.0 - alpha)
    s = np.maximum(s, 1e-8).astype(np.float32)
    return w * s[:, None], (1.0 / s).astype(np.float32)


def quantize_int8_params(
    params,
    act_scales: Optional[Dict[str, np.ndarray]] = None,
    alpha: float = 0.5,
):
    """Quantize a loaded bf16/fp16 param pytree's dense-layer linears to W8A8
    int8 in place of their ``{"w"}`` leaves (reference AutoInt8 quantize-at-
    load, linear.cpp:432-630). With ``act_scales`` (from
    ``utils.calibrate.calc_act_scales``) the SmoothQuant migration folds
    activation outliers into the weights and stores the inverse ``smooth``
    vector for the runtime (ops/quant.int8_linear). Embedding, lm_head,
    norms, routers and already-quantized leaves are untouched."""
    targets = (
        "qkv_proj", "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_up_proj", "gate_proj", "up_proj", "down_proj",
    )

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            sub = f"{path}.{k}" if path else k
            if isinstance(v, dict):
                leaf = k in targets and "w" in v and ".experts" not in sub
                if leaf and getattr(v["w"], "ndim", 0) == 2:
                    w = np.asarray(v["w"], np.float32)
                    smooth = None
                    if act_scales is not None and sub in act_scales:
                        w, smooth = smooth_quant_weights(
                            w, act_scales[sub], alpha
                        )
                    q = auto_int8_from_fp(w)
                    import jax.numpy as jnp

                    new = {
                        "w_q": jnp.asarray(q["w_q"]),
                        "scale": jnp.asarray(q["scale"]),
                    }
                    if smooth is not None:
                        new["smooth"] = jnp.asarray(smooth)
                    if "b" in v:
                        new["b"] = v["b"]
                    out[k] = new
                else:
                    out[k] = walk(v, sub)
            else:
                out[k] = v
        return out

    return walk(params, "")
