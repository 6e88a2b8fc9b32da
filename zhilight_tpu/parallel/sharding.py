"""Parameter and activation sharding rules.

TPU-native replacement for the reference's ``DistLayout`` weight distribution
(3rd/bmengine .../core/context.cpp:678-760 ``distribute_parameter`` with
COLUMNAR / ROW / REPLICATED) and the hand-placed NCCL all-reduces after
attention-out / ff-out (src/nn/block/block.cpp:188-195). Here shardings are
declared as PartitionSpecs per parameter name; XLA inserts the collectives.

Convention for weight matrices: all kernels are stored as ``[in_dim, out_dim]``
(x @ W). "Column parallel" (reference COLUMNAR) shards out_dim; "row parallel"
(reference ROW) shards in_dim and implies a psum on the output.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS

__all__ = [
    "param_pspec",
    "shard_params",
    "COL",
    "ROW",
    "REP",
]

# PartitionSpecs for 2-D [in, out] kernels
COL = P(None, TP_AXIS)  # shard output dim  (qkv, gate, up, expert in)
ROW = P(TP_AXIS, None)  # shard input dim   (o_proj, down)
REP = P()               # replicated        (norms, biases of row-parallel outs)

# name-pattern → spec table. Matched against flattened param paths like
# "layers.0.attn.q_proj.w". First match wins.
_RULES = [
    # attention projections
    (r"\.attn\.(q_proj|k_proj|v_proj|qkv_proj)\.w$", COL),
    (r"\.attn\.(q_proj|k_proj|v_proj|qkv_proj)\.b$", P(TP_AXIS)),
    (r"\.attn\.o_proj\.w$", ROW),
    (r"\.attn\.o_proj\.b$", REP),
    # qk-norm scales are per-head-dim, replicated
    (r"\.attn\.(q_norm|k_norm)\.", REP),
    # MLA: low-rank a-projections replicated (small), b-projections head-sharded
    (r"\.attn\.(q_a_proj|kv_a_proj)\.w$", REP),
    (r"\.attn\.(q_a_norm|kv_a_norm)\.", REP),
    (r"\.attn\.(q_b_proj|kv_b_proj)\.w$", COL),
    # dense mlp
    (r"\.mlp\.(gate_proj|up_proj|gate_up_proj)\.w$", COL),
    (r"\.mlp\.down_proj\.w$", ROW),
    (r"\.mlp\.(gate_proj|up_proj|gate_up_proj)\.b$", P(TP_AXIS)),
    (r"\.mlp\.down_proj\.b$", REP),
    # MoE: experts stacked on dim 0, sharded over tp (expert parallelism —
    # reference MOE_EXP_PARALLEL, feedforward.cpp:251-262)
    (r"\.mlp\.experts\.(gate_proj|up_proj|gate_up_proj)\.w$", P(TP_AXIS, None, None)),
    (r"\.mlp\.experts\.down_proj\.w$", P(TP_AXIS, None, None)),
    # quantized expert stacks shard the expert dim too (reference GPTQMOE
    # composed with MOE_EXP_PARALLEL, feedforward.cpp:251-267,967-1075)
    (
        r"\.mlp\.experts\.(gate_proj|up_proj|gate_up_proj|down_proj)\.(w_p|scales|zeros)$",
        P(TP_AXIS, None, None),
    ),
    (
        r"\.mlp\.experts\.(gate_proj|up_proj|gate_up_proj|down_proj)\.(g_idx|perm)$",
        P(TP_AXIS, None),
    ),
    (r"\.mlp\.router\.", REP),
    (r"\.mlp\.shared_expert(_gate)?\.(gate_proj|up_proj|gate_up_proj)\.w$", COL),
    (r"\.mlp\.shared_expert\.down_proj\.w$", ROW),
    # embeddings: vocab-sharded (reference RawEmbedding parallel mode,
    # src/nn/embedding/embedding.cu)
    (r"(^|\.)embedding\.w$", P(TP_AXIS, None)),
    (r"(^|\.)lm_head\.w$", COL),
    # norms replicated
    (r"\.(ln_attn|ln_ff|ln_final|input_layernorm|post_attention_layernorm)\.", REP),
    (r"(^|\.)final_norm\.", REP),
]

_COMPILED = [(re.compile(pat), spec) for pat, spec in _RULES]


def param_pspec(path: str, ndim: int) -> P:
    # layer-stacked leaves carry a leading [L] axis: prepend an unsharded dim
    # to the matched base rule (models/stacked.py)
    stacked = path.startswith("layer_stack.") or ".layer_stack." in path
    for pat, spec in _COMPILED:
        if pat.search(path):
            if stacked and len(spec) > 0:
                return P(None, *spec)
            return spec
    return REP


def _flatten(tree: Dict[str, Any], prefix: str = ""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, path)
        else:
            yield path, v


def pspec_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Build a pytree of PartitionSpecs matching a params pytree."""

    def build(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = build(v, path)
            else:
                out[k] = param_pspec(path, getattr(v, "ndim", 0))
        return out

    return build(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host param pytree onto the mesh with TP sharding."""
    specs = pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
