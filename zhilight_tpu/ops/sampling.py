"""Device-side batched sampling.

Parity target: the reference's GPU sampling stack — ``random_sampler_gpu``
top-p/top-k/temperature (src/generator/random_util.cu, TopKWrapper per-task
curand generators batch_generator.cpp:182-260), repetition/presence penalties
and logit bias applied in the scheduler loop (batch_generator.cpp:1639-1730),
and top-logprobs reporting.

TPU design: everything is one fused [B, V] program per step. Token-occurrence
counts live on device ([B, V] int32, reset when a slot is reassigned) so
penalties need no host round-trip. Per-slot determinism uses
``jax.random.fold_in(key, seed, step)`` instead of per-task curand streams.
Greedy decoding is temperature == 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "SamplerState", "new_sampler_state", "sample_step", "apply_penalties"]

NEG_INF = -1.0e30


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SamplingParams:
    """Per-slot sampling parameters, batched [B]."""

    temperature: jax.Array   # [B] f32; 0 => greedy
    top_p: jax.Array         # [B] f32 in (0, 1]
    top_k: jax.Array         # [B] int32; 0 => disabled
    min_p: jax.Array         # [B] f32; 0 => disabled (scaled by top prob)
    repetition_penalty: jax.Array  # [B] f32; 1 => off
    presence_penalty: jax.Array    # [B] f32; 0 => off
    frequency_penalty: jax.Array   # [B] f32; 0 => off
    seed: jax.Array          # [B] int32

    def tree_flatten(self):
        return (
            (
                self.temperature,
                self.top_p,
                self.top_k,
                self.min_p,
                self.repetition_penalty,
                self.presence_penalty,
                self.frequency_penalty,
                self.seed,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def greedy(batch: int) -> "SamplingParams":
        z = jnp.zeros((batch,), jnp.float32)
        return SamplingParams(
            temperature=z,
            top_p=jnp.ones((batch,), jnp.float32),
            top_k=jnp.zeros((batch,), jnp.int32),
            min_p=z,
            repetition_penalty=jnp.ones((batch,), jnp.float32),
            presence_penalty=z,
            frequency_penalty=z,
            seed=jnp.zeros((batch,), jnp.int32),
        )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SamplerState:
    """Per-slot device state across steps."""

    token_counts: jax.Array  # [B, V] int32 occurrences (prompt + generated)
    step: jax.Array          # [B] int32 decode step counter

    def tree_flatten(self):
        return ((self.token_counts, self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def new_sampler_state(batch: int, vocab: int) -> SamplerState:
    return SamplerState(
        token_counts=jnp.zeros((batch, vocab), jnp.int32),
        step=jnp.zeros((batch,), jnp.int32),
    )


def record_tokens(
    state: SamplerState, slot: jax.Array, tokens: jax.Array, reset: bool = True
) -> SamplerState:
    """Count prompt tokens of a (re)assigned slot: used by the scheduler when
    admitting a task. ``tokens`` [T] padded with -1. Prompts longer than the
    largest compiled bucket are recorded in several calls: the first resets
    the slot's counts, later ones accumulate (``reset=False``)."""
    counts = state.token_counts
    if reset:
        counts = counts.at[slot].set(0)
    onehot = jnp.zeros((state.token_counts.shape[1],), jnp.int32).at[tokens].add(
        jnp.where(tokens >= 0, 1, 0), mode="drop"
    )
    counts = counts.at[slot].add(onehot)
    step = state.step.at[slot].set(0) if reset else state.step
    return SamplerState(token_counts=counts, step=step)


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    counts: jax.Array,  # [B, V] int32
    p: SamplingParams,
) -> jax.Array:
    """Repetition (mul/div), presence, frequency penalties
    (reference batch_generator.cpp:1639-1708 semantics)."""
    seen = counts > 0
    rep = p.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - p.presence_penalty[:, None] * seen.astype(jnp.float32)
    logits = logits - p.frequency_penalty[:, None] * counts.astype(jnp.float32)
    return logits


def _top_k_top_p_mask(logits: jax.Array, top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Mask logits outside per-slot top-k / nucleus top-p — WITHOUT sorting.

    A full [B, V] sort per step is the reference's GPU approach (bitonic
    topk, functions/sort.cu) but is the single most expensive op in a TPU
    sampled-decode step at 100k+ vocabs. Both thresholds are found instead
    by value-domain bisection (~30 cheap masked reductions, exact to fp32
    resolution; boundary ties keep every tied token — the only deviation
    from the sort formulation, and the standard one):

      top-k threshold: largest t with  count(logits >= t) >= k
      top-p threshold: largest t with  mass(probs >= t)  >= p
    """
    B, V = logits.shape
    k = jnp.where((top_k <= 0) | (top_k > V), V, top_k).astype(jnp.float32)

    # probabilities for the mass search (stable softmax, no sort needed)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - mx)
    probs = ex / jnp.sum(ex, axis=-1, keepdims=True)

    def bisect(values, target_fn, lo, hi, iters=30):
        # invariant: target_fn(lo) holds, target_fn(hi) may not
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            ok = target_fn(mid)
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return lo

    # top-k: count(logits >= t) >= k
    lo0 = jnp.min(logits, axis=-1)
    hi0 = jnp.max(logits, axis=-1)

    def count_ok(t):
        return jnp.sum((logits >= t[:, None]).astype(jnp.float32), axis=-1) >= k

    thr_k = bisect(logits, count_ok, lo0, hi0)
    keep_k = logits >= thr_k[:, None]

    # top-p: mass(probs >= t) >= p  (always keeps the argmax)
    def mass_ok(t):
        return (
            jnp.sum(jnp.where(probs >= t[:, None], probs, 0.0), axis=-1)
            >= top_p
        )

    thr_p = bisect(probs, mass_ok, jnp.zeros((B,), jnp.float32), probs.max(-1))
    keep_p = probs >= thr_p[:, None]
    return keep_k & keep_p


def sample_step(
    logits: jax.Array,  # [B, V] f32
    state: SamplerState,
    p: SamplingParams,
    key: jax.Array,
    logit_bias_tokens: Optional[jax.Array] = None,  # [B, NB] int32, -1 pad
    logit_bias_values: Optional[jax.Array] = None,  # [B, NB] f32
    penalty_tokens: Optional[jax.Array] = None,  # [B, NP] int32, -1 pad
    penalty_values: Optional[jax.Array] = None,  # [B, NP] f32 multiplicative
    num_logprobs: int = 0,
    greedy_only: bool = False,  # static: skip top-k/p sort + gumbel entirely
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, SamplerState]:
    """One sampling step for every slot.

    ``penalty_tokens``/``penalty_values`` carry host-computed multiplicative
    penalties (the reference's ngram x repetition map, beam_util.cu
    calc_repetition_ngram + beam_repetition_penalty): logit>0 ? l/v : l*v.
    Slots using them have repetition_penalty set to 1 on device so the
    count-based path doesn't double-penalize.

    Returns (tokens [B], chosen_logprob [B], top_logprobs [B, num_logprobs],
    top_tokens [B, num_logprobs], new_state).
    """
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    logits = apply_penalties(logits, state.token_counts, p)

    if penalty_tokens is not None:
        vmap_ = jnp.ones((B, V), jnp.float32).at[
            jnp.arange(B)[:, None], jnp.where(penalty_tokens >= 0, penalty_tokens, V)
        ].set(jnp.maximum(penalty_values, 1e-6), mode="drop")
        logits = jnp.where(logits > 0, logits / vmap_, logits * vmap_)

    if logit_bias_tokens is not None:
        bias = jnp.zeros((B, V), jnp.float32).at[
            jnp.arange(B)[:, None], jnp.where(logit_bias_tokens >= 0, logit_bias_tokens, V)
        ].add(logit_bias_values, mode="drop")
        logits = logits + bias

    logprobs_full = jax.nn.log_softmax(logits, axis=-1)

    if greedy_only:
        # whole batch decodes greedily this window: the [B, V] sort for
        # top-k/top-p and the gumbel draw are dead weight (~2.4 ms/step for
        # a 122k vocab on v5e)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        greedy = p.temperature <= 0.0
        temp = jnp.where(greedy, 1.0, jnp.maximum(p.temperature, 1e-6))
        scaled = logits / temp[:, None]
        mask = _top_k_top_p_mask(scaled, p.top_k, p.top_p)
        # min_p: drop tokens with prob < min_p * p_max — in logit space,
        # l < l_max + ln(min_p) (sort-free, exact; the reference protocol
        # carries min_p but its engine ignores it)
        lmax = jnp.max(scaled, axis=-1, keepdims=True)
        minp = jnp.clip(p.min_p, 0.0, 1.0)[:, None]
        cut = lmax + jnp.log(jnp.maximum(minp, 1e-30))
        mask = mask & ((scaled >= cut) | (minp <= 0.0))
        masked = jnp.where(mask, scaled, NEG_INF)

        # per-slot deterministic stream: fold (seed, step) into the engine key
        def slot_key(seed, step):
            return jax.random.fold_in(jax.random.fold_in(key, seed), step)

        keys = jax.vmap(slot_key)(p.seed, state.step)
        gumbel = -jnp.log(-jnp.log(
            jax.vmap(lambda k: jax.random.uniform(k, (V,), minval=1e-20, maxval=1.0))(keys)
        ))
        sampled = jnp.argmax(masked + gumbel, axis=-1)
        greedy_tok = jnp.argmax(logits, axis=-1)
        tokens = jnp.where(greedy, greedy_tok, sampled).astype(jnp.int32)

    chosen_logprob = jnp.take_along_axis(logprobs_full, tokens[:, None], axis=-1)[:, 0]

    if num_logprobs > 0:
        top_lp, top_tok = jax.lax.top_k(logprobs_full, num_logprobs)
    else:
        top_lp = jnp.zeros((B, 0), jnp.float32)
        top_tok = jnp.zeros((B, 0), jnp.int32)

    new_state = SamplerState(
        token_counts=state.token_counts.at[jnp.arange(B), tokens].add(1),
        step=state.step + 1,
    )
    return tokens, chosen_logprob, top_lp, top_tok.astype(jnp.int32), new_state
