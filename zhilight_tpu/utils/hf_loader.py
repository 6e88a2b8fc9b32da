"""HF checkpoint loading: safetensors / torch .bin → the engine's param pytree.

Parity target: ``zhilight/loader.py`` ``LLaMALoader`` (HF→internal name
mapping ``_replace_name`` :250+, multi-file safetensors/pt load,
convert_quant_dict for GPTQ/AWQ tensors) and the bf16-as-int16 / fp8-as-int8
view tricks in zhilight/llama.py:187-206 (not needed here: jax/numpy handle
bf16 natively via ml_dtypes).

HF stores linear weights as [out, in]; this engine stores [in, out] (x @ W),
so dense kernels are transposed on load. MoE expert weights are stacked to
[E, in, out] for grouped matmuls.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..config.model_config import ModelConfig

__all__ = ["load_hf_state", "map_hf_params", "iter_safetensors"]


# ---------------------------------------------------------------------------
# raw tensor iteration
# ---------------------------------------------------------------------------

def iter_safetensors(model_path: str) -> Iterable[Tuple[str, np.ndarray]]:
    """Yield (name, numpy array) from every *.safetensors file in a directory."""
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors not available") from e

    files = sorted(
        f for f in os.listdir(model_path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_path}")
    for fname in files:
        with safe_open(os.path.join(model_path, fname), framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _iter_torch_bin(model_path: str) -> Iterable[Tuple[str, np.ndarray]]:
    """Fallback loader for .bin / .pt torch checkpoints.

    The reference has a custom mmap'd lazy unpickler (zhilight/lazy_unpickling.py);
    torch (CPU) is available in this environment so we use it directly.
    """
    import torch

    files = sorted(
        f
        for f in os.listdir(model_path)
        if f.endswith(".bin") or f.endswith(".pt")
    )
    for fname in files:
        state = torch.load(
            os.path.join(model_path, fname), map_location="cpu", mmap=True, weights_only=True
        )
        for name, t in state.items():
            if t.dtype == torch.bfloat16:
                yield name, t.view(torch.int16).numpy().view(np.dtype("bfloat16"))
            else:
                yield name, t.numpy()


def iter_checkpoint(model_path: str) -> Iterable[Tuple[str, np.ndarray]]:
    names = os.listdir(model_path)
    if any(n.endswith(".safetensors") for n in names):
        return iter_safetensors(model_path)
    return _iter_torch_bin(model_path)


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

# (hf regex, target template, needs_transpose). {i}=layer, {e}=expert.
# Target path "-" means: intentionally dropped.
_DENSE_RULES: List[Tuple[str, str, bool]] = [
    (r"^(model|language_model(\.model)?)\.embed_tokens\.weight$", "embedding.w", False),
    (r"^(model|language_model(\.model)?)\.norm\.weight$", "final_norm.w", False),
    (r"^lm_head\.weight$", "lm_head.w", True),
    (r"L\.input_layernorm\.weight$", "layers.{i}.ln_attn.w", False),
    (r"L\.post_attention_layernorm\.weight$", "layers.{i}.ln_ff.w", False),
    # attention
    (r"L\.self_attn\.(q|k|v|o)_proj\.weight$", "layers.{i}.attn.{m}_proj.w", True),
    (r"L\.self_attn\.(q|k|v|o)_proj\.bias$", "layers.{i}.attn.{m}_proj.b", False),
    (r"L\.self_attn\.(q|k)_norm\.weight$", "layers.{i}.attn.{m}_norm.w", False),
    # MLA (deepseek)
    (r"L\.self_attn\.q_a_proj\.weight$", "layers.{i}.attn.q_a_proj.w", True),
    (r"L\.self_attn\.q_a_layernorm\.weight$", "layers.{i}.attn.q_a_norm.w", False),
    (r"L\.self_attn\.q_b_proj\.weight$", "layers.{i}.attn.q_b_proj.w", True),
    (r"L\.self_attn\.kv_a_proj_with_mqa\.weight$", "layers.{i}.attn.kv_a_proj.w", True),
    (r"L\.self_attn\.kv_a_layernorm\.weight$", "layers.{i}.attn.kv_a_norm.w", False),
    (r"L\.self_attn\.kv_b_proj\.weight$", "layers.{i}.attn.kv_b_proj.w", True),
    # dense mlp
    (r"L\.mlp\.(gate|up|down)_proj\.weight$", "layers.{i}.mlp.{m}_proj.w", True),
    # qwen2-moe / deepseek shared+routed
    (r"L\.mlp\.gate\.weight$", "layers.{i}.mlp.router.w", True),
    (r"L\.mlp\.gate\.e_score_correction_bias$", "layers.{i}.mlp.router.e_score_correction_bias", False),
    (r"L\.mlp\.shared_expert\.(gate|up|down)_proj\.weight$", "layers.{i}.mlp.shared_expert.{m}_proj.w", True),
    (r"L\.mlp\.shared_experts\.(gate|up|down)_proj\.weight$", "layers.{i}.mlp.shared_expert.{m}_proj.w", True),
    (r"L\.mlp\.shared_expert_gate\.weight$", "layers.{i}.mlp.shared_expert_gate.w", True),
    (r"L\.mlp\.experts\.E\.(gate|up|down)_proj\.weight$", "layers.{i}.mlp.experts.{m}_proj.w.{e}", True),
    # mixtral
    (r"L\.block_sparse_moe\.gate\.weight$", "layers.{i}.mlp.router.w", True),
    (r"L\.block_sparse_moe\.experts\.E\.w1\.weight$", "layers.{i}.mlp.experts.gate_proj.w.{e}", True),
    (r"L\.block_sparse_moe\.experts\.E\.w3\.weight$", "layers.{i}.mlp.experts.up_proj.w.{e}", True),
    (r"L\.block_sparse_moe\.experts\.E\.w2\.weight$", "layers.{i}.mlp.experts.down_proj.w.{e}", True),
    # rotary inv_freq buffers occasionally stored in checkpoints
    (r"rotary_emb\.inv_freq$", "-", False),
]


def _compile_rules():
    out = []
    for pat, target, tr in _DENSE_RULES:
        pat = pat.replace("L", r"^(?:model|language_model(?:\.model)?)\.layers\.(?P<i>\d+)")
        pat = pat.replace("E", r"(?P<e>\d+)")
        out.append((re.compile(pat), target, tr))
    return out


_COMPILED_RULES = _compile_rules()


def map_hf_name(name: str) -> Optional[Tuple[str, bool, Optional[int]]]:
    """HF tensor name -> (target path, transpose?, expert index or None)."""
    for pat, target, tr in _COMPILED_RULES:
        mobj = pat.search(name)
        if not mobj:
            continue
        if target == "-":
            return None
        gd = mobj.groupdict()
        groups = [g for g in mobj.groups() if g is not None]
        # {m} = the matched projection letter/name: last non-index group
        m = None
        for g in reversed(groups):
            if g is not None and not g.isdigit():
                m = g
                break
        path = target
        if "{i}" in path:
            path = path.replace("{i}", gd["i"])
        if "{m}" in path:
            path = path.replace("{m}", m)
        e = int(gd["e"]) if gd.get("e") is not None else None
        if "{e}" in path:
            path = path.replace(".{e}", "")
        return path, tr, e
    return None


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def _set_path(tree: Dict[str, Any], path: str, value):
    parts = path.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _get_path(tree: Dict[str, Any], path: str):
    node = tree
    for part in path.split("."):
        node = node[part]
    return node


def _fast_transpose(arr: np.ndarray) -> np.ndarray:
    """Contiguous 2-D transpose via torch's blocked multithreaded kernel.

    numpy's strided copy of a GB-scale 2-byte tensor (ml_dtypes bf16 goes
    through a per-element path) takes minutes for a 152k x 5k lm_head; the
    torch int16-view transpose does it in ~3 s. Bit-pattern view only — no
    value conversion."""
    if arr.ndim == 2 and arr.dtype.itemsize in (1, 2, 4, 8) and arr.flags.c_contiguous:
        try:
            import warnings

            import torch

            view = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[arr.dtype.itemsize]
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # non-writable numpy arrays
                t = torch.from_numpy(arr.view(view))
            return t.t().contiguous().numpy().view(arr.dtype)
        except Exception:  # pragma: no cover - torch missing/unsupported dtype
            pass
    return np.ascontiguousarray(arr.T)


def _to_jax(arr: np.ndarray, dtype) -> "jax.Array":
    """jnp.asarray with the dtype cast done in torch.

    ``jnp.asarray(arr, dtype=...)`` takes the slow elementwise path whenever
    the dtype kwarg is present — even for a no-op cast (~30 MB/s vs ~GB/s
    measured on the load host); numpy/ml_dtypes float casts are equally
    scalar-slow. torch's vectorized casts are bit-identical (RNE) and ~200x
    faster, same trick as _fast_transpose."""
    import jax.numpy as jnp

    try:
        import ml_dtypes

        tgt = np.dtype(dtype)
        if arr.dtype == tgt:
            return jnp.asarray(arr)
        if tgt == np.dtype(ml_dtypes.bfloat16) and arr.dtype.kind == "f":
            import torch

            t = torch.from_numpy(np.ascontiguousarray(arr))
            out = t.to(torch.bfloat16).view(torch.int16).numpy().view(ml_dtypes.bfloat16)
            return jnp.asarray(out)
        if arr.dtype == np.dtype(ml_dtypes.bfloat16) and tgt.kind == "f":
            import torch

            t = torch.from_numpy(arr.view(np.int16)).view(torch.bfloat16)
            return jnp.asarray(t.to({
                np.dtype(np.float32): torch.float32,
                np.dtype(np.float16): torch.float16,
            }[tgt]).numpy())
    except Exception:  # pragma: no cover - torch/ml_dtypes missing
        pass
    return jnp.asarray(arr, dtype=dtype)


_QUANT_SUFFIXES = ("qweight", "qzeros", "scales", "g_idx", "weight_scale", "weight_scale_inv")


def map_hf_params(
    tensors: Iterable[Tuple[str, np.ndarray]],
    cfg: ModelConfig,
    dtype=None,
    strict: bool = True,
    quant_method: Optional[str] = None,
) -> Dict[str, Any]:
    """Build the nested param dict from (hf_name, array) pairs.

    ``quant_method`` ("gptq" | "awq" | "fp8") converts packed checkpoint
    tensors into the engine's canonical quant formats (reference
    convert_quant_dict, zhilight/loader.py:199-244).
    """
    import jax.numpy as jnp

    dtype = dtype or cfg.jax_dtype
    tree: Dict[str, Any] = {}
    expert_stash: Dict[str, Dict[int, np.ndarray]] = {}
    quant_stash: Dict[str, Dict[str, Any]] = {}  # linear path -> kind -> array
    unmapped: List[str] = []

    for name, arr in tensors:
        # quantized linear tensors: strip the kind suffix, map the base name
        kind = None
        base = name
        for suf in _QUANT_SUFFIXES:
            if name.endswith("." + suf):
                kind = suf
                base = name[: -(len(suf) + 1)] + ".weight"
                break
        if (
            kind is None
            and quant_method == "fp8"
            and name.endswith(".weight")
            and arr.dtype.itemsize == 1
        ):
            # fp8 checkpoints keep the projection under its plain .weight
            # name; stash the raw fp8 payload so the block scales are
            # APPLIED at conversion (the dense rule used to load it as an
            # unscaled bf16 cast — garbage numerics)
            kind = "weight"
        if kind is not None:
            mapped = map_hf_name(base)
            if mapped is None:
                unmapped.append(name)
                continue
            path, _, e = mapped
            path = path[: -len(".w")]  # strip trailing .w
            entry = quant_stash.setdefault(path, {})
            if e is not None:
                entry.setdefault(kind, {})[e] = arr
            else:
                entry[kind] = arr
            continue

        mapped = map_hf_name(name)
        if mapped is None:
            if map_hf_name_is_dropped(name):
                continue
            unmapped.append(name)
            continue
        path, transpose, e = mapped
        if transpose:
            arr = _fast_transpose(arr)
        if e is not None:
            expert_stash.setdefault(path, {})[e] = arr
        else:
            _set_path(tree, path, _to_jax(arr, _target_dtype(path, dtype)))

    for path, experts in expert_stash.items():
        E = max(experts) + 1
        stacked = np.stack([experts[i] for i in range(E)], axis=0)
        _set_path(tree, path, _to_jax(stacked, dtype))

    if quant_stash:
        _convert_quant_stash(tree, quant_stash, quant_method, dtype)

    if strict and unmapped:
        raise ValueError(f"unmapped checkpoint tensors: {unmapped[:10]}")
    return tree


def _fp8_dequant_host(w_oi: np.ndarray, scale_oi, dtype) -> np.ndarray:
    """[out, in] fp8 + block/channel/tensor scales -> [in, out] dequantized,
    all on host via torch (vectorized fp8 decode; numpy/ml_dtypes is
    scalar-slow). Scales may be 2-D [out/B, in/B] (block), 1-D [out]
    (per-channel) or 0-D (per-tensor)."""
    import ml_dtypes
    import torch

    t = torch.from_numpy(np.ascontiguousarray(w_oi).view(np.uint8)).view(
        torch.float8_e4m3fn
    ).to(torch.float32)
    if scale_oi is not None:
        scale_oi = np.asarray(scale_oi)
        s = torch.from_numpy(np.ascontiguousarray(scale_oi, np.float32))
        if scale_oi.ndim == 2:
            so, si = scale_oi.shape
            Bo = w_oi.shape[0] // so
            Bi = w_oi.shape[1] // si
            t = (t.reshape(so, Bo, si, Bi) * s[:, None, :, None]).reshape(w_oi.shape)
        elif scale_oi.ndim == 1:  # per-output-channel
            t = t * s[:, None]
        elif scale_oi.ndim == 0:  # per-tensor
            t = t * s
        else:
            raise ValueError(
                f"unsupported fp8 weight_scale layout: ndim={scale_oi.ndim}"
            )
    torch_dtype = {
        np.dtype(np.float16): torch.float16,
        np.dtype(np.float32): torch.float32,
    }.get(np.dtype(dtype) if dtype is not None else None, torch.bfloat16)
    out = t.t().contiguous().to(torch_dtype)
    if torch_dtype is torch.bfloat16:
        return out.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
    return out.numpy()


def _convert_fp8_entry(tree, path, entry, dtype):
    """One fp8 linear (or per-expert stack): apply the 128x128 block scales.

    Default: dequantize to bf16 AT LOAD — on v5e the fp8->bf16 VPU convert
    inside a fused kernel is slower than streaming bf16 (no native fp8 MXU
    ingest; tools/probe_fp8.py), so full-speed serving wants bf16 weights.
    ``ZT_FP8_KEEP=1`` keeps the fp8 payload + block_scale for the Pallas
    dequant-in-VMEM kernel instead (half the HBM footprint/traffic,
    VPU-convert-bound: the HBM-capacity trade, e.g. fitting a bigger model).
    """
    import jax.numpy as jnp

    w = entry.get("weight")
    scale = entry.get("weight_scale_inv", entry.get("weight_scale"))
    keep = os.environ.get("ZT_FP8_KEEP") == "1"
    if w is None:
        # scale tensor without a stashed weight (non-fp8-dtype weight went
        # through the dense rule): record the scale for runtime use
        if scale is not None:
            _set_path(
                tree, path + ".block_scale",
                jnp.asarray(np.ascontiguousarray(scale.T), jnp.float32),
            )
        return
    per_expert = isinstance(w, dict)
    if per_expert:
        E = max(w) + 1
        ws = [w[e] for e in range(E)]
        ss = [scale[e] if isinstance(scale, dict) else scale for e in range(E)]
    else:
        ws, ss = [w], [scale]
    if keep:
        if any(s is None for s in ss) or any(np.asarray(s).ndim != 2 for s in ss):
            raise ValueError(
                f"ZT_FP8_KEEP=1 requires 2-D block scales for every fp8 "
                f"weight; {path} has scale="
                f"{[None if s is None else np.asarray(s).shape for s in ss]}"
            )
        wt = np.stack([np.ascontiguousarray(x.T) for x in ws]) if per_expert else np.ascontiguousarray(ws[0].T)
        st = np.stack([np.ascontiguousarray(s.T) for s in ss]) if per_expert else np.ascontiguousarray(ss[0].T)
        _set_path(tree, path + ".w_f8", jnp.asarray(wt))
        _set_path(tree, path + ".block_scale", jnp.asarray(st, jnp.float32))
        return
    deq = [_fp8_dequant_host(x, s, dtype) for x, s in zip(ws, ss)]
    arr = np.stack(deq) if per_expert else deq[0]
    _set_path(tree, path + ".w", jnp.asarray(arr))


def _convert_quant_stash(tree, quant_stash, quant_method, dtype):
    import jax.numpy as jnp

    from .quant_convert import convert_quant_tensors

    from .quant_convert import gptq_planar_qweight

    def _gptq_trivial_gidx(entry) -> bool:
        g = entry.get("g_idx")
        if g is None or len(g) == 0:
            return True
        gs = len(g) // entry["scales"].shape[0]
        return bool(np.array_equal(g, np.arange(len(g)) // gs))

    for path, entry in quant_stash.items():
        if quant_method == "fp8":
            _convert_fp8_entry(tree, path, entry, dtype)
            continue
        first = next(iter(entry.values()))
        if isinstance(first, dict):  # per-expert quant tensors
            E = max(max(v) for v in entry.values() if isinstance(v, dict)) + 1
            parts = []
            for e in range(E):
                one = {k: v[e] for k, v in entry.items() if isinstance(v, dict)}
                parts.append(convert_quant_tensors(one, quant_method))
            if any("perm" in p for p in parts):
                # act_order (desc_act=true) expert stacks: every expert's
                # rows were group-sorted by its own g_idx; experts without a
                # non-trivial g_idx get the identity so the stack is uniform.
                # The runtime composes the per-expert K-permutation into the
                # token-side gather (models/moe.quant_experts_contribution) —
                # reference exllama q_gemm g_idx handling, src/nn/quant/gptq/
                K = parts[0]["w_p"].shape[0]
                for p in parts:
                    if "perm" not in p:
                        p["perm"] = np.arange(K, dtype=np.int32)
            canon = {
                k: np.stack([p[k] for p in parts], axis=0)
                for k in parts[0]
            }
            canon = _pad_canon_int4(canon)
        elif (
            quant_method == "gptq"
            and "qweight" in entry
            and _planar_fast_path_ok(entry)
            and _gptq_trivial_gidx(entry)
        ):
            # fast path: checkpoint int32 -> planar-packed uint8 directly on
            # host (no int8 [K, N] intermediate, half the device upload);
            # zeros/scales still go through the canonical converter
            meta = convert_quant_tensors(
                {
                    "qweight": entry["qweight"][:1],  # zeros/scales only
                    "qzeros": entry["qzeros"],
                    "scales": entry["scales"],
                },
                quant_method,
            )
            _set_path(tree, f"{path}.w_p", jnp.asarray(gptq_planar_qweight(entry["qweight"])))
            _set_path(tree, f"{path}.scales", jnp.asarray(meta["scales"], jnp.float32))
            _set_path(tree, f"{path}.zeros", jnp.asarray(meta["zeros"], jnp.float32))
            continue
        else:
            canon = convert_quant_tensors(entry, quant_method)
            if canon is not None:
                canon = _pad_canon_int4(canon)
        if canon is None:
            continue
        for k, v in canon.items():
            tgt = jnp.int8 if k == "w_p" else (jnp.int32 if k == "perm" else jnp.float32)
            if k == "w_p" and v.ndim == 3 and v.shape[1] % 2 == 0:
                # per-expert planar pack (quant_ragged.pack_expert_int4
                # layout): the fused grouped MoE kernel streams experts at
                # 4 bits/weight; the dequant fallback unpacks per expert
                K = v.shape[1]
                packed = v[:, : K // 2].astype(np.uint8) | (
                    (v[:, K // 2 :].astype(np.uint8) ^ 8) << 4
                )
                _set_path(tree, f"{path}.{k}", jnp.asarray(packed))
                continue
            arr = _to_jax(v, tgt)
            if k == "w_p" and _packable_int4(v.shape):
                # 4 bits/weight in HBM for the fused kernel (quant.pack_int4
                # global-planar layout); XLA fallbacks unpack transparently
                from ..ops.quant import pack_int4

                arr = pack_int4(arr)
            _set_path(tree, f"{path}.{k}", arr)


def _planar_fast_path_ok(entry) -> bool:
    """Direct int32->planar pack needs K % 256 == 0 AND group boundaries
    inside one nibble plane (K % (2*gs) == 0); otherwise go canonical so
    _pad_canon_int4 can pad."""
    K = entry["qweight"].shape[0] * 8
    gs = K // entry["scales"].shape[0]
    return K % 256 == 0 and K % (2 * gs) == 0


def _pad_canon_int4(canon):
    """Pad the canonical int4 K dim to a multiple of 2*group_size.

    The planar packed layout (low nibbles = K rows [0, K/2), high =
    [K/2, K)) requires every quant group to live inside one nibble plane
    (kernel constraint Kh % gs == 0 — ops/pallas/quant_ragged /
    quant_matmul). Geometries like DeepSeek-V2-Lite's expert down_proj
    (K=1408, gs=128) violate it; padding K at the END with zero-SCALE
    groups keeps the dequant exact (pad rows contribute scale*anything=0)
    while activations pad with zero columns at call time (ops/quant
    int4_linear, models/moe.quant_experts_contribution)."""
    w = canon["w_p"]  # [K, N] or [E, K, N] int8 nibbles
    K = w.shape[-2]
    G = canon["scales"].shape[-2]
    gs = K // G
    K2 = -(-K // (2 * gs)) * (2 * gs)
    if K2 == K:
        return canon
    pad_w = [(0, 0)] * w.ndim
    pad_w[-2] = (0, K2 - K)
    canon["w_p"] = np.pad(w, pad_w)
    pad_s = [(0, 0)] * canon["scales"].ndim
    pad_s[-2] = (0, K2 // gs - G)
    canon["scales"] = np.pad(canon["scales"], pad_s)  # zero scales
    canon["zeros"] = np.pad(canon["zeros"], pad_s)
    if "perm" in canon:
        p = canon["perm"]  # [K] or [E, K]
        extra = np.broadcast_to(
            np.arange(K, K2, dtype=p.dtype), p.shape[:-1] + (K2 - K,)
        )
        canon["perm"] = np.concatenate([p, extra], axis=-1)
    return canon


def _packable_int4(shape) -> bool:
    # 2-D only (per-expert stacks keep nibble form until the MoE path packs)
    return len(shape) == 2 and shape[0] % 256 == 0


def _target_dtype(path: str, dtype):
    import jax.numpy as jnp

    # routers stay fp32 for routing numerics (reference MOE_ROUTER_FLOAT)
    if ".router." in path:
        return jnp.float32
    return dtype


def map_hf_name_is_dropped(name: str) -> bool:
    return name.endswith("rotary_emb.inv_freq") or ".vision" in name


def load_hf_state(model_path: str, cfg: ModelConfig, dtype=None, quant=None) -> Dict[str, Any]:
    """Load a full HF checkpoint directory into the engine's param pytree.

    ``quant`` is the QuantConfig derived from the checkpoint's
    ``quantization_config`` — it selects the packed-tensor conversion
    (reference convert_quant_dict dispatch, zhilight/loader.py:199-244)."""
    method = None
    if quant is not None and quant.enabled:
        from ..config.quant_config import QuantType

        method = {
            QuantType.GPTQ: "gptq",
            QuantType.AWQ: "awq",
            QuantType.FP8: "fp8",
            QuantType.FP8_BLOCK: "fp8",
        }.get(quant.quant_type)
    params = map_hf_params(
        iter_checkpoint(model_path), cfg, dtype=dtype, strict=False, quant_method=method
    )
    if cfg.tie_lm_head and "lm_head" in params:
        del params["lm_head"]
    return params
