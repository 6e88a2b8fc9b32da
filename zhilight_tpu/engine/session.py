"""Incremental multi-turn sessions.

Parity: reference ``SessionGenerator`` (zhilight/session_generator.py:16-71)
— feed context chunks incrementally, roll back speculative tokens, reuse the
session's KV across turns (scheduler session support,
batch_generator.cpp:1424-1444,1500-1516).

TPU adaptation: the client keeps the full token history; the scheduler pins
the session's KV pages between turns keyed by session_id, so each turn only
prefills the new chunk (cache_len picks up where the last turn ended).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

from .task import GeneratorArg, RequestResult

__all__ = ["SessionGenerator"]


class SessionGenerator:
    def __init__(self, generator, session_id: Optional[str] = None):
        """``generator`` is a started DynamicBatchGenerator."""
        self._gen = generator
        self.session_id = session_id or f"sess_{time.time():.3f}"
        self._history: List[int] = []
        self._first = True
        self._rollback = 0

    @property
    def context_len(self) -> int:
        return len(self._history)

    def feed(self, input_ids: Sequence[int]) -> RequestResult:
        """Encode a chunk into the session KV without generating
        (reference feed: max_length=1 mimics encode-only)."""
        return self.generate(input_ids, GeneratorArg(max_length=1), _keep_output=False)

    def generate(
        self,
        input_ids: Sequence[int],
        arg: Optional[GeneratorArg] = None,
        _keep_output: bool = True,
    ) -> RequestResult:
        arg = arg or GeneratorArg()
        import dataclasses

        self._history.extend(int(t) for t in input_ids)
        # valid KV for this turn = history length before the new chunk
        # (already excludes rolled-back tokens)
        arg = dataclasses.replace(
            arg,
            session_id=self.session_id,
            session_continue=not self._first,
            sess_chunk_pos=(len(self._history) - len(list(input_ids)))
            if not self._first
            else 0,
        )
        self._rollback = 0
        res = self._gen.generate(list(self._history), arg)
        self._first = False
        if _keep_output and res.outputs:
            self._history.extend(res.outputs[0].token_ids)
        return res

    def rollback_speculative(self, num_tokens: int):
        """Drop the last ``num_tokens`` from the session context (reference
        rollback_speculative)."""
        assert num_tokens <= len(self._history)
        del self._history[len(self._history) - num_tokens :]
        self._rollback += num_tokens

    def close(self):
        self._gen.scheduler.close_session(self.session_id)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
