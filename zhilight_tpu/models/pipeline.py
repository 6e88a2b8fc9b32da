"""Pipeline-parallel forward: layer stages placed on a ``pp`` mesh axis.

Parity target: the reference's intra-process pipeline placement
(``partition_layer_devices`` assigns layer ranges to devices and
EncoderLayer switches device per range, allocate_util.hpp:12-22 +
block.cpp:527-546). That form is *sequential* — stages run one after another
for a batch; its purpose is memory capacity (the reference README recommends
TP over PP, and so do we).

TPU-native design: the layer-stacked parameters (models/stacked.py) are
sharded ``P("pp")`` on the leading layer axis, the single KV pool is sharded
``P("pp")`` on its slot axis (layer-major slots make each stage's layers own a
contiguous slot range), and a ``shard_map`` runs the stages: at step ``t``
stage ``t`` applies its local layer slice under ``lax.cond`` while the other
stages pass through; activations move stage-to-stage with ``ppermute``. The
final hidden state is broadcast back with a masked ``psum``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, axis_names=None):
        kw = {}
        if axis_names is not None:
            # partial-manual mode: only these axes are manual; the rest (tp,
            # dp) stay AUTO so sharding propagation + the custom_partitioning
            # kernel rules keep working inside (this is how pp composes with
            # tp — reference pp groups OF tp ranks, engine.cpp:94-106)
            kw["axis_names"] = axis_names
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, *, mesh, in_specs, out_specs, axis_names=None):
        kw = {"auto": frozenset(set(mesh.axis_names) - set(axis_names))} if axis_names else {}
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False, **kw)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.model_config import ModelConfig
from ..kvcache.paged import KVCache
from .base import DecodeMeta
from . import llama as L
from . import stacked as SK

__all__ = [
    "forward_decode_pp",
    "forward_prefill_pp",
    "shard_params_pp",
    "cache_pspec",
    "PPForwards",
    "PP_AXIS",
]

PP_AXIS = "pp"

Params = Dict[str, jax.Array]


def cache_pspec(cache: KVCache):
    """Per-leaf PartitionSpecs splitting the pool on its SLOT dim over pp
    (layer-major slots make each stage's layers a contiguous slot range):
    dim 1 for head-major packed pools [H, N, X], dim 0 otherwise
    ([N, H, D] pools, [N, H] scales, [N, L] latent)."""
    def spec(x):
        s = [None] * x.ndim
        s[1 if (x.ndim == 3 and cache.packed) else 0] = PP_AXIS
        return P(*s)

    return jax.tree.map(spec, cache)


def shard_params_pp(cfg: ModelConfig, params: Params, mesh: Mesh) -> Params:
    """Stack layers and shard the stack over the pp axis, composing with the
    usual TP specs on the per-layer dims (reference: pp groups OF tp ranks,
    3rd/bmengine engine.cpp:94-106): a layer-stack leaf [L, in, out] becomes
    P("pp", <tp spec>). Embedding / head / final norm follow their plain TP
    rules (replicated when tp == 1)."""
    from ..parallel.sharding import param_pspec

    stacked = SK.stack_params(cfg, params)
    axes = set(mesh.axis_names)

    def _known(spec):
        # drop axis names the mesh doesn't carry (pp-only meshes have no tp)
        return tuple(a if a in axes else None for a in tuple(spec))

    def place(path, x):
        base = _known(param_pspec(path, getattr(x, "ndim", 0)))
        if path.startswith("layer_stack"):
            # param_pspec's stacked handling gives P(None, *tp_spec); the
            # leading (layer) dim shards over pp instead
            return jax.device_put(x, NamedSharding(mesh, P(PP_AXIS, *base[1:])))
        return jax.device_put(x, NamedSharding(mesh, P(*base)))

    def walk(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = walk(v, path)
            else:
                out[k] = place(path, v)
        return out

    return walk(stacked)


def _forward_pp(
    params: Params,
    cfg: ModelConfig,
    rope,
    tokens: jax.Array,  # [B]
    meta,
    cache: KVCache,  # single pool, slots layer-major, sharded P("pp") on dim 0
    mesh: Mesh,
    mode: str,
    input_embeddings=None,
) -> Tuple[jax.Array, KVCache]:
    pp = mesh.shape[PP_AXIS]
    layers_per_stage = cfg.num_layers // pp
    pages_per_layer = cache.num_pages // cfg.num_layers
    S = cache.page_size
    n_slots_layer = pages_per_layer * S

    layer_leaf_spec = P(PP_AXIS)
    rep = P()

    param_specs = jax.tree.map(lambda _: rep, params)
    param_specs["layer_stack"] = jax.tree.map(lambda _: layer_leaf_spec, params["layer_stack"])
    cache_specs = cache_pspec(cache)

    def stage_fn(params_l, tokens, meta, cache_l, emb):
        # params_l["layer_stack"]: local [layers_per_stage, ...]
        stage = jax.lax.axis_index(PP_AXIS)
        x = L.embed(params_l, cfg, tokens) if emb is None else emb

        def apply_stage(x, cache_pool):
            def body(carry, xs):
                x, pool = carry
                p, local_layer = xs
                slot_map = jnp.where(
                    meta.slot_mapping >= 0,
                    meta.slot_mapping + local_layer * n_slots_layer,
                    -1,
                )
                if mode == "decode":
                    meta_l = DecodeMeta(
                        positions=meta.positions,
                        slot_mapping=slot_map,
                        page_tables=jnp.where(
                            meta.page_tables >= 0,
                            meta.page_tables + local_layer * pages_per_layer,
                            -1,
                        ),
                        context_lens=meta.context_lens,
                    )
                else:
                    from .base import PrefillMeta
                    meta_l = PrefillMeta(
                        positions=meta.positions,
                        slot_mapping=slot_map,
                        page_table=jnp.where(
                            meta.page_table >= 0,
                            meta.page_table + local_layer * pages_per_layer,
                            -1,
                        ),
                        cache_len=meta.cache_len,
                        q_len=meta.q_len,
                    )
                x, pool = L.decoder_layer(
                    p, cfg, rope, x, meta.positions, pool, 0, meta_l,
                    "decode" if mode == "decode" else "prefill",
                )
                return (x, pool), None

            ids = jnp.arange(layers_per_stage, dtype=jnp.int32)
            (x, cache_pool), _ = jax.lax.scan(
                body, (x, cache_pool), (params_l["layer_stack"], ids), unroll=1
            )
            return x, cache_pool

        for t in range(pp):
            x, cache_l = jax.lax.cond(
                stage == t,
                lambda x, c: apply_stage(x, c),
                lambda x, c: (x, c),
                x, cache_l,
            )
            if t + 1 < pp:
                # hand the activation to the next stage
                perm = [(i, (i + 1) % pp) for i in range(pp)]
                x = jax.lax.ppermute(x, PP_AXIS, perm)

        if mode == "chunk":
            # intermediate prefill chunk: only the cache writes matter
            return jnp.zeros((1,), jnp.float32), cache_l

        # final hidden lives on the last stage; broadcast it back (f32: the
        # XLA:CPU AllReducePromotion pass check-fails cloning a bf16
        # all-reduce inside a partial-manual shard_map region)
        x = jax.lax.psum(
            jnp.where(stage == pp - 1, x, jnp.zeros_like(x)).astype(jnp.float32),
            PP_AXIS,
        ).astype(x.dtype)
        hidden = L._norm(params_l["final_norm"], cfg, x)
        if mode == "hidden":
            return hidden, cache_l
        if mode == "prefill":
            hidden = hidden[jnp.maximum(meta.q_len - 1, 0)]
        logits = L.get_logits(params_l, cfg, hidden)
        return logits, cache_l

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            param_specs, rep, jax.tree.map(lambda _: rep, meta), cache_specs,
            rep if input_embeddings is not None else None,
        ),
        out_specs=(rep, cache_specs),
        # only pp is manual; tp/dp stay auto so TP sharding propagation (and
        # the custom_partitioning kernel rules) work inside each stage
        axis_names={PP_AXIS},
    )
    # KVCache is a pytree; shard_map sees its leaves
    logits, cache = fn(params, tokens, meta, cache, input_embeddings)
    return logits, cache


def forward_decode_pp(params, cfg, rope, tokens, meta: DecodeMeta, cache, mesh):
    return _forward_pp(params, cfg, rope, tokens, meta, cache, mesh, "decode")


def forward_prefill_pp(params, cfg, rope, tokens, meta, cache, mesh,
                       input_embeddings=None):
    """Prefill across pp stages; returns logits for the last prompt token
    (stacked.forward_prefill semantics)."""
    return _forward_pp(params, cfg, rope, tokens, meta, cache, mesh, "prefill",
                       input_embeddings)


class PPForwards:
    """Executor-facing adapter with the llama/stacked module signatures, so
    ``ModelExecutor`` dispatches PP forwards exactly like the other modes
    (reference: partition_layer_devices makes PP transparent to the
    generator, allocate_util.hpp:12-22)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def forward_decode(self, params, cfg, rope, tokens, meta, cache):
        return forward_decode_pp(params, cfg, rope, tokens, meta, cache, self.mesh)

    def forward_prefill(self, params, cfg, rope, tokens, meta, cache,
                        input_embeddings=None):
        return forward_prefill_pp(
            params, cfg, rope, tokens, meta, cache, self.mesh,
            input_embeddings=input_embeddings,
        )

    def backbone_chunk(self, params, cfg, rope, tokens, meta, cache,
                       input_embeddings=None):
        _, cache = _forward_pp(
            params, cfg, rope, tokens, meta, cache, self.mesh, "chunk",
            input_embeddings,
        )
        return cache

    def forward_score(self, params, cfg, rope, tokens, meta, cache):
        # full-sequence logits: prefill without the last-token slice
        return _forward_pp(
            params, cfg, rope, tokens, meta, cache, self.mesh, "score"
        )

    def forward_hidden(self, params, cfg, rope, tokens, meta, cache):
        return _forward_pp(
            params, cfg, rope, tokens, meta, cache, self.mesh, "hidden"
        )
