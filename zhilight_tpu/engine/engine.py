"""Model executor: owns params, KV cache, sampler state and compiled step fns.

This is the TPU-native replacement for the reference execution stack:
``core::Engine`` device management + ``ModelContext`` per-rank contexts +
``join_forward``'s fused encode/decode model call
(src/generator/batch_generator.cpp:1337-1423). Instead of thread-per-GPU and
NCCL, there is one process driving a (possibly multi-host) mesh with three
jit-compiled programs, all with the cache/sampler state donated so XLA updates
them in place:

  chunk_step  — prefill chunk, no logits (reference "pure chunk" iterations
                that skip get_logits, batch_generator.cpp:1546-1550)
  prefill_step — prefill chunk + last-token logits + first-token sampling
  decode_step — one token for every active slot + sampling

Shape discipline: prefill token-count buckets and a fixed decode batch, so
there are at most |buckets|*2+1 compiled programs.
"""

from __future__ import annotations

import functools
import logging
import math
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import EngineConfig, ModelConfig, QuantConfig
from ..config.engine_config import CacheConfig, SchedulerConfig
from ..kvcache.paged import KVCache, new_kv_cache, new_latent_cache
from ..models import llama as llama_mod
from ..models import stacked as stacked_mod
from ..models.base import DecodeMeta, PrefillMeta
from ..ops.sampling import (
    SamplerState,
    SamplingParams,
    new_sampler_state,
    record_tokens,
    sample_step,
)
from ..parallel.mesh import TP_AXIS, make_mesh
from ..parallel.sharding import pspec_tree, shard_params

logger = logging.getLogger(__name__)

__all__ = ["ModelExecutor"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class ModelExecutor:
    """Holds device state and compiled step functions for one model."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Dict[str, Any],
        engine_cfg: EngineConfig,
        mesh=None,
    ):
        self.cfg = cfg
        self.engine_cfg = engine_cfg
        self.sched_cfg = self._trim_buckets(engine_cfg)
        self.cache_cfg = engine_cfg.cache
        pcfg = engine_cfg.parallel
        # multi-host: join the jax.distributed runtime (reference NCCL
        # uniqueID broadcast, engine.cpp:122-133) and open the scheduler
        # control channel (reference ZMQ HostCommunicator)
        from ..parallel.control_plane import make_control_plane
        from ..parallel.mesh import mesh_from_config

        self.plane = make_control_plane(pcfg)
        if mesh is not None:
            self.mesh = mesh
        elif pcfg.num_hosts > 1:
            self.mesh = mesh_from_config(pcfg)
        else:
            self.mesh = make_mesh(tp=pcfg.tp, dp=pcfg.dp, pp=pcfg.pp)
        from ..parallel import enable_kernel_partitioning

        # partitioning rules apply to jit-visible tp/dp sharding; under a
        # pp-only mesh the kernels run inside shard_map on local shards,
        # where custom_partitioning must NOT wrap them
        _shape = dict(self.mesh.shape)
        enable_kernel_partitioning(
            _shape.get("tp", 1) * _shape.get("dp", 1) > 1
        )
        self.rope = llama_mod.build_rope(cfg, engine_cfg.max_model_len)

        # pipeline parallelism: layer stages over the pp mesh axis
        # (models/pipeline.py shard_map; reference partition_layer_devices,
        # allocate_util.hpp:12-22). Composes with tp — pp groups OF tp ranks
        # like the reference (world_size=tp, pp_size=total/tp,
        # engine.cpp:94-106) — via partial-manual shard_map (pp manual,
        # tp auto). dp is not composed with pp.
        self.pp = dict(self.mesh.shape).get("pp", pcfg.pp)
        if self.pp > 1:
            if pcfg.dp > 1:
                raise NotImplementedError("pp does not compose with dp; use tp")
            if not stacked_mod.is_stackable(cfg):
                raise ValueError("pipeline parallelism needs homogeneous layers")
            if cfg.num_layers % self.pp:
                raise ValueError(f"num_layers {cfg.num_layers} % pp {self.pp} != 0")

        # homogeneous-layer models CAN scan over stacked params (3 Pallas
        # kernels total, depth-independent compile — models/stacked.py), but
        # on current XLA the layer-scan carries the full KV pool and copies it
        # per iteration, so the per-layer loop stays the default. Opt in with
        # ZT_STACK=1. PP implies the stacked layout (stages scan their local
        # layer slice).
        import os as _os

        self.stacked = self.pp > 1 or (
            stacked_mod.is_stackable(cfg) and _os.environ.get("ZT_STACK") == "1"
        )

        if self.pp > 1:
            from ..models import pipeline as pipeline_mod

            self._pp_fwd = pipeline_mod.PPForwards(self.mesh)
            self.params = pipeline_mod.shard_params_pp(cfg, params, self.mesh)
        else:
            self._pp_fwd = None
            if self.stacked:
                params = stacked_mod.stack_params(cfg, params)
            with self.mesh:
                self.params = shard_params(params, self.mesh)
        params = None  # drop the pre-sharding reference before cache alloc

        self.page_size = self.cache_cfg.page_size
        self.num_pages = self._decide_num_pages()
        self.max_pages_per_seq = _round_up(engine_cfg.max_model_len, self.page_size) // self.page_size
        self.max_batch = self.sched_cfg.max_batch

        self.cache = self._new_cache()
        self.sampler_state = self._new_sampler_state()
        self.base_key = jax.random.PRNGKey(self.sched_cfg.seed or 0)

        # decode window: steps fused per device program (reference hides
        # per-step latency with CUDA streams; here tokens feed back on device
        # and the host syncs once per window)
        ms = self.sched_cfg.decode_multi_step
        self.decode_window = ms if ms > 0 else (8 if jax.default_backend() == "tpu" else 1)

        # Pinned output formats for the donated state: XLA otherwise picks a
        # slots-minor layout for the step outputs, and every subsequent step
        # pays full-cache layout-conversion copies reconciling the entry
        # arrays with the Pallas kernels' default-layout operands.
        self._rep = NamedSharding(self.mesh, P())
        if jax.default_backend() == "tpu" and _os.environ.get("ZT_NO_FMT_PIN") != "1":
            from jax.experimental import layout as XL

            def fmt(x):
                return XL.Format(
                    XL.Layout(major_to_minor=tuple(range(x.ndim))), x.sharding
                )

            self._cache_fmt = jax.tree.map(fmt, self.cache)
            self._state_fmt = jax.tree.map(fmt, self.sampler_state)
        else:
            self._cache_fmt = jax.tree.map(lambda x: x.sharding, self.cache)
            self._state_fmt = jax.tree.map(lambda x: x.sharding, self.sampler_state)

        self._compiled: Dict[Any, Callable] = {}
        # device-resident decode window carry (see run_decode_multi)
        self._decode_carry: Optional[tuple] = None


    def _fwd_mod(self):
        """Forward-function provider: PP adapter, stacked module, or per-layer."""
        return self._pp_fwd or (stacked_mod if self.stacked else llama_mod)

    # ------------------------------------------------------------------
    # sizing
    # ------------------------------------------------------------------
    @staticmethod
    def _trim_buckets(engine_cfg: EngineConfig) -> SchedulerConfig:
        """Drop prefill buckets no chunk can ever fill: chunks are capped at
        ``chunk_size`` (and the model length), so buckets above the smallest
        one covering that cap are dead shapes — warmup would compile slow,
        large programs for them (e.g. the default 8192 bucket on a
        max_model_len=4k server)."""
        import dataclasses

        sc = engine_cfg.scheduler
        cap = min(sc.chunk_size, _round_up(engine_cfg.max_model_len, 128))
        cover = next((b for b in sc.prefill_buckets if b >= cap), None)
        bks = tuple(b for b in sc.prefill_buckets if cover is None or b <= cover)
        if not bks:
            bks = (_round_up(cap, 128),)
        if bks == sc.prefill_buckets:
            return sc
        return dataclasses.replace(sc, prefill_buckets=bks)

    def _decide_num_pages(self) -> int:
        cc = self.cache_cfg
        if cc.num_pages:
            return cc.num_pages
        # size from free HBM after params (reference auto memory-limit:
        # free - RESERVE_MEM_MB, py_model_base.cpp:59-92 + kv_buf_bytes
        # accounting in batch_generator.cpp:585-630)
        free = 0
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            used = stats.get("bytes_in_use", 0)
            if limit:
                free = (limit - used) * cc.hbm_utilization - cc.reserved_hbm_mb * (1 << 20)
        except Exception:
            pass
        if free <= 0 and jax.default_backend() == "tpu":
            # memory_stats can be unavailable (e.g. tunneled runtimes): size
            # from known per-chip HBM minus the loaded parameters
            hbm_by_kind = {"v5 lite": 16, "v5e": 16, "v4": 32, "v5p": 95, "v6e": 32}
            kind = jax.local_devices()[0].device_kind.lower()
            hbm_gb = next((v for k, v in hbm_by_kind.items() if k in kind), 16)
            param_bytes = sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
            ) // max(jax.device_count(), 1)
            free = (
                hbm_gb * (1 << 30) - param_bytes
            ) * cc.hbm_utilization - cc.reserved_hbm_mb * (1 << 20)
        per_token = self._kv_bytes_per_token()
        if free <= 0:
            # CPU tests / unknown platform: budget from max_total_token
            return max(
                _round_up(self.sched_cfg.max_total_token or 8192, self.page_size)
                // self.page_size,
                8,
            )
        tokens = int(free // per_token)
        if self.sched_cfg.max_total_token:
            # explicit KV token budget caps the pool even when HBM sizing
            # succeeds (operator memory-headroom knob)
            tokens = min(tokens, self.sched_cfg.max_total_token)
        if not cc.enable_prefix_caching:
            # without prefix retention, pages beyond the maximum concurrent
            # context are unusable
            tokens = min(tokens, self.sched_cfg.max_batch * self.engine_cfg.max_model_len)
        return max(tokens // self.page_size, 8)

    def _kv_bytes_per_token(self) -> int:
        cfg = self.cfg
        if cfg.mla.enabled:
            # latent cache (reference LATENT_CACHE sizing, batch_generator.cpp:594-596)
            return cfg.num_layers * cfg.mla.latent_dim * 2
        itemsize = 1 if self.cache_cfg.kv_dtype == "int8" else 2
        per = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.dim_head * itemsize
        if self.cache_cfg.kv_dtype == "int8":
            per += cfg.num_layers * 2 * cfg.num_kv_heads * 4  # scales
        # kv heads are sharded over tp
        return max(per // max(self.engine_cfg.parallel.tp, 1), 1)

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def _new_cache(self) -> KVCache:
        cfg = self.cfg
        with self.mesh:
            if cfg.mla.enabled:
                return new_latent_cache(
                    cfg.num_layers, self.num_pages, self.page_size, cfg.mla.latent_dim,
                    cfg.jax_dtype,
                    sharding=NamedSharding(self.mesh, P()),
                )
            # KV heads sharded over tp: slot-major [N_slots, H, D] pools
            # put heads on dim 1; packed pools are head-major [H, N, 2D]
            # (dim 0). stacked models use ONE pool with num_layers*num_pages
            # pages; the scan body offsets page indices by layer
            # (models/stacked.py)
            from ..kvcache.paged import _use_packed

            layers = 1 if self.stacked else cfg.num_layers
            pages = self.num_pages * (cfg.num_layers if self.stacked else 1)
            quantized = self.cache_cfg.kv_dtype == "int8"
            packed = _use_packed(cfg.dim_head, quantized)
            if self.pp > 1:
                # PP shards the SLOT dim (layer-major slots: each stage's
                # layers form a contiguous slot range, models/pipeline.py);
                # the KV-head dim shards over tp as usual when composing
                from ..models.pipeline import PP_AXIS

                kv_spec = (
                    P(TP_AXIS, PP_AXIS, None) if packed else P(PP_AXIS, TP_AXIS, None)
                )
                scale_spec = P(PP_AXIS, TP_AXIS)
            else:
                kv_spec = P(TP_AXIS, None, None) if packed else P(None, TP_AXIS, None)
                scale_spec = P(None, TP_AXIS)
            return new_kv_cache(
                layers,
                pages,
                self.page_size,
                cfg.num_kv_heads,
                cfg.dim_head,
                cfg.jax_dtype,
                quantized=quantized,
                kv_sharding=NamedSharding(self.mesh, kv_spec),
                scale_sharding=NamedSharding(self.mesh, scale_spec),
            )

    def _new_sampler_state(self) -> SamplerState:
        state = new_sampler_state(self.max_batch, self.cfg.vocab_size)
        sharding = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------
    def _get(self, key, builder):
        fn = self._compiled.get(key)
        if fn is None:
            fn = builder()
            self._compiled[key] = fn
        return fn

    def _chunk_step_fn(self, bucket: int, with_emb: bool = False):
        cfg, rope = self.cfg, self.rope

        @functools.partial(
            jax.jit, donate_argnums=(2,), out_shardings=self._cache_fmt
        )
        def chunk_step(params, tokens, cache, meta, emb):
            if self.stacked:
                return self._fwd_mod().backbone_chunk(
                    params, cfg, rope, tokens, meta, cache,
                    input_embeddings=emb if with_emb else None,
                )
            _, cache = llama_mod.backbone(
                params, cfg, rope, tokens, meta.positions, cache, meta, "prefill",
                input_embeddings=emb if with_emb else None,
            )
            return cache

        return chunk_step

    def _chunk_fused_fn(self, bucket: int):
        """Chunk program that builds its PrefillMeta ON DEVICE from
        (pages, [start, chunk]): the per-chunk host->device traffic drops
        from ~5 small arrays to tokens + one 2-int array, which matters when
        every transfer pays a dispatch round trip (measured ~120 ms of the
        3.7k-prompt TTFT was host gaps between chunk dispatches)."""
        cfg, rope = self.cfg, self.rope
        S = self.page_size

        @functools.partial(
            jax.jit, donate_argnums=(2,), out_shardings=self._cache_fmt
        )
        def chunk_fused(params, tokens, cache, pages, sc):
            start, chunk = sc[0], sc[1]
            i = jnp.arange(bucket, dtype=jnp.int32)
            pos = jnp.where(i < chunk, start + i, 0)
            page = pages[jnp.clip(pos // S, 0, pages.shape[0] - 1)]
            slots = jnp.where((i < chunk) & (page >= 0), page * S + pos % S, -1)
            meta = PrefillMeta(
                positions=pos,
                slot_mapping=slots,
                page_table=pages,
                cache_len=start,
                q_len=chunk,
            )
            _, cache = llama_mod.backbone(
                params, cfg, rope, tokens, meta.positions, cache, meta, "prefill"
            )
            return cache

        return chunk_fused

    def _chunk_chain_fn(self, bucket: int, num_chunks: int):
        """C consecutive FULL chunks in one program (lax.scan over the fused
        chunk body): one dispatch + one token upload for the whole chain
        instead of C round trips. The ~10 ms/dispatch tunnel gap between
        chunk programs was ~90 ms of the 306 ms MiniCPM TTFT (PROFILES r4).
        Requires num_chunks even (scan unroll=2 — XLA only forwards the
        donated KV pool through the loop carry at unroll 2, same as
        _decode_multi_fn)."""
        cfg, rope = self.cfg, self.rope
        S = self.page_size
        assert num_chunks % 2 == 0, num_chunks

        @functools.partial(
            jax.jit, donate_argnums=(2,), out_shardings=self._cache_fmt
        )
        def chunk_chain(params, tokens_c, cache, pages, start0):
            i = jnp.arange(bucket, dtype=jnp.int32)

            def body(cache, inp):
                tokens, c = inp
                start = start0 + c * bucket
                pos = start + i
                page = pages[jnp.clip(pos // S, 0, pages.shape[0] - 1)]
                slots = jnp.where(page >= 0, page * S + pos % S, -1)
                meta = PrefillMeta(
                    positions=pos,
                    slot_mapping=slots,
                    page_table=pages,
                    cache_len=start,
                    q_len=jnp.int32(bucket),
                )
                _, cache = llama_mod.backbone(
                    params, cfg, rope, tokens, meta.positions, cache, meta,
                    "prefill",
                )
                return cache, ()

            cache, _ = jax.lax.scan(
                body, cache,
                (tokens_c, jnp.arange(num_chunks, dtype=jnp.int32)),
                unroll=2,
            )
            return cache

        return chunk_chain

    # chain lengths compiled/used, longest first (all even: scan unroll=2)
    CHAIN_SIZES = (8, 4, 2)

    def run_chunk_chain(self, tokens_c: np.ndarray, pages_dev, start0: int):
        """Run ``tokens_c.shape[0]`` consecutive full chunks in one program."""
        C, bucket = tokens_c.shape
        fn = self._get(
            ("chunk_chain", bucket, C), lambda: self._chunk_chain_fn(bucket, C)
        )
        self.cache = fn(
            self.params,
            jnp.asarray(tokens_c),
            self.cache,
            pages_dev,
            jnp.int32(start0),
        )

    @property
    def supports_fused_chunk(self) -> bool:
        """On-device meta construction needs the per-layer llama path and
        default (arange) positions."""
        return not self.stacked and self.pp == 1

    def run_chunk_fused(self, tokens: np.ndarray, pages_dev, start: int, chunk: int):
        """run_chunk with device-side meta construction. ``pages_dev`` is the
        sequence's FULL padded page table already on device."""
        bucket = tokens.shape[0]
        fn = self._get(("chunk_fused", bucket), lambda: self._chunk_fused_fn(bucket))
        self.cache = fn(
            self.params,
            jnp.asarray(tokens),
            self.cache,
            pages_dev,
            jnp.asarray(np.array([start, chunk], np.int32)),
        )

    def _prefill_step_fn(self, bucket: int, num_logprobs: int, nb: int, np_: int,
                         with_emb: bool = False):
        cfg, rope = self.cfg, self.rope

        rep = self._rep

        @functools.partial(
            jax.jit,
            donate_argnums=(2, 3),
            out_shardings=(rep, rep, rep, rep, self._cache_fmt, self._state_fmt),
        )
        def prefill_step(params, tokens, cache, sampler_state, meta, sparams, slot, key,
                         bias_tok, bias_val, pen_tok, pen_val, emb):
            mod = self._fwd_mod()
            logits, cache = mod.forward_prefill(
                params, cfg, rope, tokens, meta, cache,
                input_embeddings=emb if with_emb else None,
            )
            # sample the first token for this slot only
            row = logits[None].astype(jnp.float32)  # [1, V]
            sl = jax.tree.map(lambda a: a[slot][None], sparams)
            st = SamplerState(
                token_counts=sampler_state.token_counts[slot][None],
                step=sampler_state.step[slot][None],
            )
            tok, lp, toplp, toptok, st2 = sample_step(
                row, st, sl, key,
                logit_bias_tokens=bias_tok if nb else None,
                logit_bias_values=bias_val if nb else None,
                penalty_tokens=pen_tok if np_ else None,
                penalty_values=pen_val if np_ else None,
                num_logprobs=num_logprobs,
            )
            new_state = SamplerState(
                token_counts=sampler_state.token_counts.at[slot].set(st2.token_counts[0]),
                step=sampler_state.step.at[slot].set(st2.step[0]),
            )
            return tok[0], lp[0], toplp[0], toptok[0], cache, new_state

        return prefill_step

    @property
    def supports_packed_prefill(self) -> bool:
        """Packed multi-sequence chunks (encode groups) need the per-layer
        path (llama or MLA — mla_attention_layer handles PackedPrefillMeta);
        stacked / PP forwards read single-sequence meta."""
        return not self.stacked and self.pp == 1

    def _packed_prefill_fn(self, ns: int, tc: int):
        """One fused program for NS sequences' chunks (reference encode group,
        fill_encode_input, batch_generator.cpp:1086-1212): mid chunks write
        KV only; last chunks also sample their first token (slots[s] >= 0)."""
        cfg, rope = self.cfg, self.rope
        rep = self._rep

        @functools.partial(
            jax.jit,
            donate_argnums=(2, 3),
            out_shardings=(rep, rep, self._cache_fmt, self._state_fmt),
        )
        def packed_step(params, tokens, cache, sampler_state, meta, sparams, slots, key):
            logits, cache = llama_mod.forward_prefill_packed(
                params, cfg, rope, tokens, meta, cache
            )
            safe = jnp.maximum(slots, 0)
            sl = jax.tree.map(lambda a: a[safe], sparams)
            st = SamplerState(
                token_counts=sampler_state.token_counts[safe],
                step=sampler_state.step[safe],
            )
            tok, lp, _, _, st2 = sample_step(
                logits.astype(jnp.float32), st, sl, key
            )
            oob = jnp.where(slots >= 0, slots, sampler_state.token_counts.shape[0])
            new_state = SamplerState(
                token_counts=sampler_state.token_counts.at[oob].set(
                    st2.token_counts, mode="drop"
                ),
                step=sampler_state.step.at[oob].set(st2.step, mode="drop"),
            )
            return tok, lp, cache, new_state

        return packed_step

    def run_prefill_packed(
        self,
        tokens: np.ndarray,  # [NS * TC]
        meta,                # PackedPrefillMeta
        sparams: SamplingParams,
        slots: np.ndarray,   # [NS] int32 slot per segment; -1 = no sample
    ):
        """Returns (tokens [NS], logprobs [NS]); entries for slots == -1 are
        garbage the caller ignores."""
        ns = int(meta.page_tables.shape[0])
        tc = int(tokens.shape[0]) // ns
        fn = self._get(
            ("packed_prefill", ns, tc), lambda: self._packed_prefill_fn(ns, tc)
        )
        tok, lp, self.cache, self.sampler_state = fn(
            self.params,
            jnp.asarray(tokens),
            self.cache,
            self.sampler_state,
            meta,
            sparams,
            jnp.asarray(slots),
            self.base_key,
        )
        return np.asarray(tok), np.asarray(lp)

    def _decode_step_fn(self):
        cfg, rope = self.cfg, self.rope

        rep = self._rep

        @functools.partial(
            jax.jit,
            donate_argnums=(2, 3),
            static_argnums=(7,),
            out_shardings=(rep, rep, rep, rep, self._cache_fmt, self._state_fmt),
        )
        def decode_step(params, tokens, cache, sampler_state, meta, sparams, key, num_logprobs):
            mod = self._fwd_mod()
            logits, cache = mod.forward_decode(params, cfg, rope, tokens, meta, cache)
            tok, lp, toplp, toptok, new_state = sample_step(
                logits.astype(jnp.float32), sampler_state, sparams, key, num_logprobs=num_logprobs
            )
            return tok, lp, toplp, toptok, cache, new_state

        return decode_step

    def _use_side_window(self, num_steps: int) -> bool:
        """Window-batched KV writes: the decode window accumulates each
        layer's new rows in a side buffer and RMWs the pool once per window
        (<=2 page RMWs per slot) instead of once per step.

        OFF by default since r4: measured SLOWER than per-step writes at the
        bench geometry (MiniCPM-2B B=16 ctx 512: 1306.8 tok/s per-step vs
        1259.3 with side buffers — the per-step XLA side-attention merge and
        flush cost more than the write kernels they replace, now that the
        head-major write kernels batch all heads per descriptor).
        ZT_WINDOW_KV=1 opts back in."""
        import os

        if os.environ.get("ZT_WINDOW_KV") != "1":
            return False
        if num_steps < 2 or num_steps > self.page_size:
            return False
        cache = self.cache
        if (self.cfg.sliding_window or 0) > 0:
            return False
        if self.stacked or self.pp > 1:
            return False
        # pallas decode path only (the XLA fallback writes per step anyway);
        # GQA multi-device meshes route the partial + flush kernels through
        # their custom_partitioning wrappers (ops/pallas/partitioned.py)
        from ..models.llama import _pallas_interpret, _use_pallas_decode

        if self.cfg.mla.enabled:
            from ..models.mla import _use_pallas_mla

            return _use_pallas_mla() or _pallas_interpret()
        if not cache.packed:
            return False
        return _use_pallas_decode(self.cfg, cache) or _pallas_interpret()

    def _decode_multi_fn(self, num_steps: int, num_logprobs: int, nb: int = 0, np_: int = 0,
                         greedy_only: bool = False, donate: bool = True):
        """K decode steps in one program via lax.scan: sampled tokens feed the
        next step on device, positions/context_lens/slot mappings advance on
        device, and per-slot ``limits`` freeze slots that hit their token
        budget mid-window (their writes drop, their outputs are discarded by
        the host). Replaces the reference's per-token scheduler round trips
        (batch_generator.cpp:1445-1637) with one host sync per K tokens.
        Returns the advanced (tokens, positions, context_lens) carry so the
        host can chain windows without re-uploading state."""
        cfg, rope = self.cfg, self.rope
        S = self.page_size
        use_side = self._use_side_window(num_steps)

        rep = self._rep

        @functools.partial(
            jax.jit,
            donate_argnums=(2, 3) if donate else (),
            out_shardings=(
                rep, rep, rep, rep, self._cache_fmt, self._state_fmt, rep, rep, rep
            ),
        )
        def decode_multi(params, tokens, cache, sampler_state, page_tables, positions, context_lens, limits, sparams, key,
                         bias_tok, bias_val, pen_tok, pen_val):
            # window-batched KV writes: per-layer side buffers accumulate the
            # window's rows; the pool is RMW-written once per window by the
            # flush after the scan (models/llama.py forward_decode_window)
            if use_side:
                B = tokens.shape[0]
                entry_pos = positions
                pool_lens = jnp.maximum(context_lens - 1, 0)
                # side rows hold the model dtype; int8 pools keep them in
                # fp32 so the flush-time requantization reproduces the
                # per-step path's codes exactly (bf16 rounding of q*scale
                # would flip +-1 LSB vs writing the codes immediately)
                side_rows0 = llama_mod.new_side_rows(
                    cfg, B, num_steps,
                    jnp.float32 if cache.quantized else cfg.jax_dtype,
                )
                side_valid0 = jnp.zeros((B, num_steps), bool)

            def body(carry, k):
                if use_side:
                    tokens, cache, state, positions, context_lens, side_rows, side_valid = carry
                else:
                    tokens, cache, state, positions, context_lens = carry
                valid = (context_lens > 0) & (context_lens <= limits)
                page = jnp.take_along_axis(
                    page_tables, (positions // S)[:, None], axis=1
                )[:, 0]
                slot = jnp.where(valid, page * S + positions % S, -1)
                meta = DecodeMeta(
                    positions=positions,
                    slot_mapping=slot,
                    page_tables=page_tables,
                    context_lens=context_lens,
                )
                mod = self._fwd_mod()
                if use_side:
                    side_valid = jnp.where(
                        jnp.arange(num_steps)[None, :] == k,
                        valid[:, None],
                        side_valid,
                    )
                    logits, cache, side_rows = mod.forward_decode_window(
                        params, cfg, rope, tokens, meta, cache,
                        side_rows, side_valid, pool_lens, k,
                    )
                else:
                    logits, cache = mod.forward_decode(params, cfg, rope, tokens, meta, cache)
                tok, lp, toplp, toptok, state2 = sample_step(
                    logits.astype(jnp.float32), state, sparams, key,
                    logit_bias_tokens=bias_tok if nb else None,
                    logit_bias_values=bias_val if nb else None,
                    penalty_tokens=pen_tok if np_ else None,
                    penalty_values=pen_val if np_ else None,
                    num_logprobs=num_logprobs,
                    greedy_only=greedy_only,
                )
                # frozen slots keep their sampler state (penalty counts must
                # not absorb the garbage tokens they emit)
                state = SamplerState(
                    token_counts=jnp.where(valid[:, None], state2.token_counts, state.token_counts),
                    step=jnp.where(valid, state2.step, state.step),
                )
                tokens = jnp.where(valid, tok, tokens)
                positions = jnp.where(valid, positions + 1, positions)
                context_lens = jnp.where(valid, context_lens + 1, context_lens)
                if use_side:
                    return (
                        (tokens, cache, state, positions, context_lens, side_rows, side_valid),
                        (tok, lp, toplp, toptok),
                    )
                return (tokens, cache, state, positions, context_lens), (tok, lp, toplp, toptok)

            carry = (tokens, cache, sampler_state, positions, context_lens)
            if use_side:
                carry = carry + (side_rows0, side_valid0)
            # unroll=2 is load-bearing: with unroll=1 XLA fails to forward the
            # donated KV-pool buffers through the while-loop carry and copies
            # the whole cache every iteration (456 -> 20 ms/step measured on
            # v5e for a 10-layer model)
            carry, outs = jax.lax.scan(
                body, carry, jnp.arange(num_steps),
                unroll=2 if num_steps % 2 == 0 else 1,
            )
            if use_side:
                tokens, cache, state, positions, context_lens, side_rows, side_valid = carry
                cache = llama_mod.flush_window_rows(
                    cfg, cache, side_rows, side_valid, entry_pos, page_tables
                )
            else:
                tokens, cache, state, positions, context_lens = carry
            tok, lp, toplp, toptok = outs
            return tok, lp, toplp, toptok, cache, state, tokens, positions, context_lens

        return decode_multi

    def _copy_rows_fn(self, m: int):
        """Copy cache rows src->dst across every layer (beam-search page
        copy-on-write; reference BeamBufferManager placement sharing +
        clone_block in paged_kvcache.cu)."""

        @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=self._cache_fmt)
        def copy_rows(cache, src, dst):
            safe_src = jnp.maximum(src, 0)
            oob = jnp.where(dst >= 0, dst, cache.num_slots)

            def upd(arr):
                # packed POOLS are head-major (slots on dim 1); their int8
                # scale leaves stay slot-major [N, H] (dim 0), as do all
                # non-packed leaves
                if cache.packed and arr.ndim == 3:
                    rows = arr[:, safe_src]
                    return arr.at[:, oob].set(rows, mode="drop")
                lead = arr.shape[0]
                flat = arr.reshape(lead, -1)
                rows = flat[safe_src]
                return flat.at[oob].set(rows, mode="drop").reshape(arr.shape)

            return jax.tree.map(upd, cache)

        return copy_rows

    def copy_slots(self, src_rows: np.ndarray, dst_rows: np.ndarray):
        """Batched cache row copies (slot indices); -1 pairs are skipped."""
        m = 1
        while m < len(src_rows):
            m *= 2
        src = np.full(m, -1, np.int32)
        dst = np.full(m, -1, np.int32)
        src[: len(src_rows)] = src_rows
        dst[: len(dst_rows)] = dst_rows
        fn = self._get(("copy_rows", m), lambda: self._copy_rows_fn(m))
        self.cache = fn(self.cache, jnp.asarray(src), jnp.asarray(dst))
        self._decode_carry = None  # cache buffer replaced; force re-sync

    def _gather_rows_fn(self, m: int):
        """Read cache rows (all layers) for host offload — the device half of
        preemption swap-out (reference SwapBuf device->host copies,
        batch_generator.cpp:329-358)."""

        @jax.jit
        def gather_rows(cache, rows):
            safe = jnp.maximum(rows, 0)

            def g(arr):
                if cache.packed and arr.ndim == 3:
                    return arr[:, safe]
                lead = arr.shape[0]
                return arr.reshape(lead, -1)[safe]

            return jax.tree.map(g, cache)

        return gather_rows

    def _restore_rows_fn(self, m: int):
        @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=self._cache_fmt)
        def restore_rows(cache, rows, data):
            oob = jnp.where(rows >= 0, rows, cache.num_slots)

            def s(arr, rws):
                if cache.packed and arr.ndim == 3:
                    return arr.at[:, oob].set(rws, mode="drop")
                lead = arr.shape[0]
                flat = arr.reshape(lead, -1)
                return flat.at[oob].set(rws, mode="drop").reshape(arr.shape)

            return jax.tree.map(s, cache, data)

        return restore_rows

    @staticmethod
    def _pad_rows(rows: np.ndarray):
        m = 1
        while m < len(rows):
            m *= 2
        out = np.full(m, -1, np.int32)
        out[: len(rows)] = rows
        return out, m

    def swap_out_rows(self, rows: np.ndarray):
        """Download cache rows (slot indices, all layers) to host numpy.

        Reads ``self.cache`` — always the newest async handle, so XLA dataflow
        orders the gather after any in-flight writes. Does not mutate the
        cache; the caller frees the pages afterwards."""
        padded, m = self._pad_rows(rows)
        fn = self._get(("gather_rows", m), lambda: self._gather_rows_fn(m))
        return jax.device_get(fn(self.cache, jnp.asarray(padded)))

    def swap_in_rows(self, rows: np.ndarray, data):
        """Upload previously swapped-out rows into (freshly allocated) slots.
        ``data`` is the pytree returned by :meth:`swap_out_rows`; row count
        must match."""
        padded, m = self._pad_rows(rows)
        fn = self._get(("restore_rows", m), lambda: self._restore_rows_fn(m))
        self.cache = fn(self.cache, jnp.asarray(padded), data)
        self._decode_carry = None  # cache buffer replaced; force re-sync

    def _record_fn(self, bucket: int, reset: bool = True):
        @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=self._state_fmt)
        def record(state, slot, tokens):
            return record_tokens(state, slot, tokens, reset=reset)

        return record

    def _score_fn(self, bucket: int):
        cfg, rope = self.cfg, self.rope

        @jax.jit
        def score(params, tokens, meta, cache):
            mod = self._fwd_mod()
            logits, _ = mod.forward_score(params, cfg, rope, tokens, meta, cache)
            return logits

        return score

    def _hidden_fn(self, bucket: int):
        cfg, rope = self.cfg, self.rope

        @jax.jit
        def hid(params, tokens, meta, cache):
            mod = self._fwd_mod()
            hidden, _ = mod.forward_hidden(params, cfg, rope, tokens, meta, cache)
            return hidden

        return hid

    def run_hidden(self, tokens: np.ndarray) -> np.ndarray:
        """Full-sequence last-layer (final-norm) hidden states [T, dim]
        (reference output_hidden_states, batch_generator.cpp:734-752)."""
        return self.run_score(tokens, _kind="hidden")

    def run_score(self, tokens: np.ndarray, _kind: str = "score") -> np.ndarray:
        """Full-sequence logits for scoring utilities (reference calc_logits /
        calc_log_prob / calc_loss / calc_greedy_match, llama.h:100-131).
        Uses a scratch identity-paged cache; does not touch serving state."""
        from ..kvcache.paged import new_kv_cache as _new_kv, new_latent_cache as _new_lat

        n = int(tokens.shape[0])
        bucket = self.pick_bucket(n)
        if n > bucket:
            # longer than the largest prefill bucket: compile a dedicated
            # shape (scoring is offline; one extra compile beats truncation)
            bucket = _round_up(n, 128)
        S = self.page_size
        maxp = _round_up(bucket, S) // S
        cfg = self.cfg
        if cfg.mla.enabled:
            cache = _new_lat(cfg.num_layers, maxp, S, cfg.mla.latent_dim, cfg.jax_dtype)
        elif self.stacked:
            cache = _new_kv(
                1, maxp * cfg.num_layers, S, cfg.num_kv_heads, cfg.dim_head, cfg.jax_dtype
            )
        else:
            cache = _new_kv(
                cfg.num_layers, maxp, S, cfg.num_kv_heads, cfg.dim_head, cfg.jax_dtype
            )
        tok = np.zeros(bucket, np.int32)
        tok[:n] = tokens
        pos = np.zeros(bucket, np.int32)
        pos[:n] = np.arange(n)
        slots = np.full(bucket, -1, np.int32)
        slots[:n] = np.arange(n)
        pt = np.full(max(maxp, self.max_pages_per_seq), -1, np.int32)
        pt[:maxp] = np.arange(maxp)
        meta = PrefillMeta(
            positions=jnp.asarray(pos),
            slot_mapping=jnp.asarray(slots),
            page_table=jnp.asarray(pt),
            cache_len=jnp.int32(0),
            q_len=jnp.int32(n),
        )
        fn = self._get(
            (_kind, bucket),
            lambda: self._score_fn(bucket)
            if _kind == "score"
            else self._hidden_fn(bucket),
        )
        out = fn(self.params, jnp.asarray(tok), meta, cache)
        return np.asarray(out[:n])

    def warmup(self) -> float:
        """Startup self-test: compile and run every hot program at its serving
        shape before the first request arrives (reference VERIFY_MAX_TOKEN
        self-test, zhilight/dynamic_batch.py:415-422).

        Covers every prefill-chunk bucket, the last-chunk prefill+sample
        program on the largest bucket, and the decode-window programs (both
        greedy and sampled variants, K=window and the K=1 tail). Doubles as a
        max-shape memory check: an OOM surfaces here, at startup, not minutes
        into serving. KV-pool contents are scratch before the first admission
        and the sampler state is reset per-slot at each admission, so the
        dummy passes leave no visible state behind. Returns elapsed seconds.
        """
        t0 = time.monotonic()
        S = self.page_size
        B = self.max_batch
        for bucket in self.sched_cfg.prefill_buckets:
            maxp = min(
                _round_up(bucket, S) // S, self.num_pages, self.max_pages_per_seq
            )
            pt = np.full(self.max_pages_per_seq, -1, np.int32)
            pt[:maxp] = np.arange(maxp)
            n = min(bucket, maxp * S)
            slots = np.full(bucket, -1, np.int32)
            slots[:n] = np.arange(n)
            pos = np.zeros(bucket, np.int32)
            pos[:n] = np.arange(n)
            meta = PrefillMeta(
                positions=jnp.asarray(pos),
                slot_mapping=jnp.asarray(slots),
                page_table=jnp.asarray(pt),
                cache_len=jnp.int32(0),
                q_len=jnp.int32(n),
            )
            self.run_chunk(np.zeros(bucket, np.int32), meta)
            if self.supports_fused_chunk:
                # the scheduler's hot mid-chunk path (device-built meta)
                self.run_chunk_fused(np.zeros(bucket, np.int32), jnp.asarray(pt), 0, n)
                if bucket == self.sched_cfg.chunk_size:
                    # chunk chains (one dispatch per C full chunks): warm the
                    # sizes a long prompt's prefill can hit
                    max_chunks = self.max_pages_per_seq * S // max(bucket, 1)
                    for C in self.CHAIN_SIZES:
                        if C + 1 <= max_chunks:
                            self.run_chunk_chain(
                                np.zeros((C, bucket), np.int32),
                                jnp.asarray(pt), 0,
                            )
            sparams = SamplingParams(
                temperature=jnp.zeros(B, jnp.float32),
                top_p=jnp.ones(B, jnp.float32),
                top_k=jnp.zeros(B, jnp.int32),
                min_p=jnp.zeros(B, jnp.float32),
                repetition_penalty=jnp.ones(B, jnp.float32),
                presence_penalty=jnp.zeros(B, jnp.float32),
                frequency_penalty=jnp.zeros(B, jnp.float32),
                seed=jnp.arange(B, dtype=jnp.int32),
            )
            # a prompt's LAST chunk can land in any bucket — warm the
            # prefill+sample program for each, not just the largest
            self.run_prefill(np.zeros(bucket, np.int32), meta, sparams, 0, 0)
            # packed multi-sequence chunks: the scheduler pads groups to a
            # static NS in {2, prefill_pack} (scheduler._prefill_packed), so
            # warming those two shapes per packed bucket covers every packed
            # program a burst of short prompts can hit
            pack = self.sched_cfg.prefill_pack
            pack_cap = min(self.sched_cfg.pack_chunk_cap, self.sched_cfg.chunk_size)
            if (
                pack >= 2
                and self.supports_packed_prefill
                and bucket <= self.pick_bucket(pack_cap)
            ):
                from ..models.base import PackedPrefillMeta

                for ns in sorted({2, pack}):
                    pmeta = PackedPrefillMeta(
                        positions=jnp.asarray(np.tile(pos, ns)),
                        slot_mapping=jnp.full(ns * bucket, -1, jnp.int32),
                        page_tables=jnp.full(
                            (ns, self.max_pages_per_seq), -1, jnp.int32
                        ),
                        cache_lens=jnp.zeros(ns, jnp.int32),
                        q_lens=jnp.full(ns, n, jnp.int32),
                    )
                    self.run_prefill_packed(
                        np.zeros(ns * bucket, np.int32), pmeta, sparams,
                        np.full(ns, -1, np.int32),
                    )
            if bucket == self.sched_cfg.prefill_buckets[-1]:
                # full-batch decode windows: every slot "active" over one page
                ctx = np.ones(B, np.int32)
                ptb = np.full((B, self.max_pages_per_seq), -1, np.int32)
                ptb[:, 0] = np.arange(B) % max(self.num_pages, 1)
                for k in {1, self.decode_window}:
                    for greedy in (True, False):
                        self.run_decode_multi(
                            tokens=np.zeros(B, np.int32),
                            page_tables=ptb,
                            positions=ctx.copy(),
                            context_lens=ctx + 1,
                            limits=np.full(B, 2, np.int32),
                            sparams=sparams,
                            num_steps=k,
                            greedy_only=greedy,
                        )
        self._decode_carry = None
        jax.block_until_ready(jax.tree.leaves(self.cache)[0])
        return time.monotonic() - t0

    # ------------------------------------------------------------------
    # public API used by the scheduler (all take/return numpy at the edges)
    # ------------------------------------------------------------------
    def pick_bucket(self, n: int) -> int:
        for b in self.sched_cfg.prefill_buckets:
            if n <= b:
                return b
        return self.sched_cfg.prefill_buckets[-1]

    def record_prompt(self, slot: int, tokens: List[int]):
        # prompts longer than the largest bucket are recorded in bucket-sized
        # pieces (first call resets the slot's counts, the rest accumulate)
        cap = self.sched_cfg.prefill_buckets[-1]
        for start in range(0, max(len(tokens), 1), cap):
            piece = tokens[start : start + cap]
            bucket = self.pick_bucket(len(piece))
            reset = start == 0
            fn = self._get(
                ("record", bucket, reset), lambda: self._record_fn(bucket, reset)
            )
            padded = np.full(bucket, -1, np.int32)
            padded[: len(piece)] = piece
            self.sampler_state = fn(
                self.sampler_state, jnp.int32(slot), jnp.asarray(padded)
            )

    def _emb_arg(self, embeddings: Optional[np.ndarray], bucket: int):
        if embeddings is None:
            cached = self._compiled.get(("empty_emb", bucket))
            if cached is None:
                cached = jnp.zeros((bucket, self.cfg.dim_model), self.cfg.jax_dtype)
                self._compiled[("empty_emb", bucket)] = cached
            return cached, False
        pad = np.zeros((bucket, self.cfg.dim_model), np.float32)
        pad[: embeddings.shape[0]] = embeddings
        return jnp.asarray(pad, self.cfg.jax_dtype), True

    def run_chunk(self, tokens: np.ndarray, meta: PrefillMeta,
                  embeddings: Optional[np.ndarray] = None):
        bucket = tokens.shape[0]
        emb, with_emb = self._emb_arg(embeddings, bucket)
        fn = self._get(
            ("chunk", bucket, with_emb), lambda: self._chunk_step_fn(bucket, with_emb)
        )
        self.cache = fn(self.params, jnp.asarray(tokens), self.cache, meta, emb)

    def _pair(self, arr_tok, arr_val, rows: int):
        """Normalize optional (tokens, values) host arrays to device arrays."""
        if arr_tok is None:
            cached = self._compiled.get(("empty_pair", rows))
            if cached is None:
                cached = (jnp.zeros((rows, 0), jnp.int32), jnp.zeros((rows, 0), jnp.float32))
                self._compiled[("empty_pair", rows)] = cached
            return cached[0], cached[1], 0
        return jnp.asarray(arr_tok), jnp.asarray(arr_val), int(arr_tok.shape[1])

    def run_prefill(
        self,
        tokens: np.ndarray,
        meta: PrefillMeta,
        sparams: SamplingParams,
        slot: int,
        step_index: int,
        num_logprobs: int = 0,
        bias: Optional[Tuple[np.ndarray, np.ndarray]] = None,      # ([1,NB] tok, [1,NB] val)
        penalties: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # ([1,NP] tok, [1,NP] val)
        embeddings: Optional[np.ndarray] = None,  # [n, dim] multimodal override
    ):
        bucket = tokens.shape[0]
        bias_tok, bias_val, nb = self._pair(*(bias or (None, None)), rows=1)
        pen_tok, pen_val, np_ = self._pair(*(penalties or (None, None)), rows=1)
        emb, with_emb = self._emb_arg(embeddings, bucket)
        fn = self._get(
            ("prefill", bucket, num_logprobs, nb, np_, with_emb),
            lambda: self._prefill_step_fn(bucket, num_logprobs, nb, np_, with_emb),
        )
        key = self.base_key  # per-slot determinism comes from (seed, step) fold-in
        tok, lp, toplp, toptok, self.cache, self.sampler_state = fn(
            self.params,
            jnp.asarray(tokens),
            self.cache,
            self.sampler_state,
            meta,
            sparams,
            jnp.int32(slot),
            key,
            bias_tok,
            bias_val,
            pen_tok,
            pen_val,
            emb,
        )
        return int(tok), float(lp), np.asarray(toplp), np.asarray(toptok)

    def run_decode_multi(
        self,
        tokens: np.ndarray,        # [B] last sampled token per slot
        page_tables: np.ndarray,   # [B, maxp]
        positions: np.ndarray,     # [B] position of the token being written
        context_lens: np.ndarray,  # [B] = positions + 1 for active slots
        limits: np.ndarray,        # [B] max context_len each slot may reach
        sparams: SamplingParams,
        num_steps: int,
        num_logprobs: int = 0,
        bias: Optional[Tuple[np.ndarray, np.ndarray]] = None,      # ([B,NB] tok, [B,NB] val)
        penalties: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # ([B,NP] tok, [B,NP] val)
        greedy_only: bool = False,
        reuse_carry: bool = False,
        fetch: bool = True,
    ):
        """Returns (tokens [K, B], logprobs [K, B], top_lp [K, B, L],
        top_tok [K, B, L]); the host discards entries past each slot's limit.
        ``fetch=False`` returns the device arrays without blocking (dispatch
        is async) — pass them to :meth:`fetch` later; the scheduler overlaps
        the next window's device time with host-side result processing.

        ``reuse_carry=True`` chains from the previous window's device-resident
        (tokens, positions, context_lens, page_tables, limits) instead of
        uploading the numpy arguments — valid only when the slot set, pages
        and limits are unchanged and every slot consumed the full window."""
        B = tokens.shape[0]
        bias_tok, bias_val, nb = self._pair(*(bias or (None, None)), rows=B)
        pen_tok, pen_val, np_ = self._pair(*(penalties or (None, None)), rows=B)
        key = ("decode_multi", num_steps, num_logprobs, nb, np_, greedy_only)
        fn = self._get(
            key,
            lambda: self._decode_multi_fn(num_steps, num_logprobs, nb, np_, greedy_only),
        )
        if reuse_carry and self._decode_carry is not None and self._decode_carry[0] == key:
            _, d_tokens, d_pos, d_ctx, d_pt, d_lim = self._decode_carry
        else:
            # place with the carry outputs' sharding so chained windows hit
            # the same compiled variant (a second input-sharding variant
            # costs a full recompile)
            d_tokens = jax.device_put(tokens, self._rep)
            d_pos = jax.device_put(positions, self._rep)
            d_ctx = jax.device_put(context_lens, self._rep)
            d_pt = jax.device_put(page_tables, self._rep)
            d_lim = jax.device_put(limits, self._rep)
        tok, lp, toplp, toptok, self.cache, self.sampler_state, c_tok, c_pos, c_ctx = fn(
            self.params,
            d_tokens,
            self.cache,
            self.sampler_state,
            d_pt,
            d_pos,
            d_ctx,
            d_lim,
            sparams,
            self.base_key,
            bias_tok,
            bias_val,
            pen_tok,
            pen_val,
        )
        self._decode_carry = (key, c_tok, c_pos, c_ctx, d_pt, d_lim)
        if not fetch:
            return (tok, lp, toplp, toptok)
        return jax.device_get((tok, lp, toplp, toptok))

    @staticmethod
    def fetch(handle):
        """Block on and download a ``fetch=False`` result."""
        return jax.device_get(handle)

    def run_decode(
        self,
        tokens: np.ndarray,
        meta: DecodeMeta,
        sparams: SamplingParams,
        step_index: int,
        num_logprobs: int = 0,
    ):
        fn = self._get(("decode", num_logprobs), self._decode_step_fn)
        key = self.base_key  # per-slot determinism comes from (seed, step) fold-in
        tok, lp, toplp, toptok, self.cache, self.sampler_state = fn(
            self.params,
            jnp.asarray(tokens),
            self.cache,
            self.sampler_state,
            meta,
            sparams,
            key,
            num_logprobs,
        )
        return np.asarray(tok), np.asarray(lp), np.asarray(toplp), np.asarray(toptok)
