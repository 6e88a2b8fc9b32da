"""Model-facing batch metadata pytrees.

These are the device-visible, statically-shaped descriptors the scheduler
builds each step — the TPU analogue of the reference's ``DynBatchContext``
encode/search groups (src/model/dyn_batch_context.h:67-319: e_token/e_placement/
e_position + s_token/s_placement/s_mask and per-task len_buf).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["PrefillMeta", "PackedPrefillMeta", "DecodeMeta"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PrefillMeta:
    """One sequence's prefill chunk (chunked-prefill capable).

    T = token bucket (static). The chunk covers global positions
    [cache_len, cache_len + q_len); earlier positions are already in cache
    (prior chunks or prefix-cache hits — reference cached_len semantics,
    batch_generator.cpp:1120-1122).
    """

    positions: jax.Array     # [T] int32 global positions (pad: 0)
    slot_mapping: jax.Array  # [T] int32 flat cache slot per token; -1 pad
    page_table: jax.Array    # [max_pages] int32 pages of this sequence; -1 pad
    cache_len: jax.Array     # scalar int32
    q_len: jax.Array         # scalar int32 valid tokens in chunk

    def tree_flatten(self):
        return (
            (self.positions, self.slot_mapping, self.page_table, self.cache_len, self.q_len),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_tokens(self) -> int:
        return self.positions.shape[0]

    @property
    def max_context(self) -> int:
        return self.page_table.shape[0]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PackedPrefillMeta:
    """NS sequences' prefill chunks packed into one token batch (the
    reference "encode group": fill_encode_input packs every admitted prompt
    into one fused forward, src/generator/batch_generator.cpp:1086-1212).

    T = NS * TC (static). Segment s covers tokens [s*TC, (s+1)*TC) of the
    packed batch; its chunk spans global positions
    [cache_lens[s], cache_lens[s] + q_lens[s]). Padded segments have
    q_lens == 0. Token-level fields (positions/slot_mapping) keep the
    single-sequence layout per segment, so rope and KV writes are unchanged;
    only attention consults the per-segment tables."""

    positions: jax.Array     # [T] int32 global positions (pad: 0)
    slot_mapping: jax.Array  # [T] int32 flat cache slot per token; -1 pad
    page_tables: jax.Array   # [NS, max_pages] int32; -1 pad
    cache_lens: jax.Array    # [NS] int32
    q_lens: jax.Array        # [NS] int32 valid tokens per segment

    def tree_flatten(self):
        return (
            (self.positions, self.slot_mapping, self.page_tables, self.cache_lens, self.q_lens),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_tokens(self) -> int:
        return self.positions.shape[0]

    @property
    def num_segments(self) -> int:
        return self.page_tables.shape[0]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DecodeMeta:
    """One decode step over B slots, one new token each.

    Inactive slots have context_lens == 0 and slot_mapping == -1.
    """

    positions: jax.Array     # [B] int32 position of the new token
    slot_mapping: jax.Array  # [B] int32 flat cache slot for the new token; -1 inactive
    page_tables: jax.Array   # [B, max_pages] int32; -1 pad
    context_lens: jax.Array  # [B] int32, includes the new token

    def tree_flatten(self):
        return (
            (self.positions, self.slot_mapping, self.page_tables, self.context_lens),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch(self) -> int:
        return self.positions.shape[0]
