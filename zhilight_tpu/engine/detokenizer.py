"""Incremental UTF-8-safe streaming detokenization.

Parity: reference ``StreamHandler`` incremental decode
(zhilight/dynamic_batch.py:286-365) — hold back tokens whose decoded text ends
in an incomplete UTF-8 sequence / replacement char, and re-decode with a small
token context so sentencepiece word-boundary spaces are correct.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["IncrementalDetokenizer"]


class IncrementalDetokenizer:
    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.tokens: List[int] = []
        # index of the first token not yet emitted as text
        self.prefix_offset = 0
        # length of text already emitted for the context window
        self.read_offset = 0

    def put(self, new_tokens: List[int]) -> str:
        """Add tokens; return newly-finalized text (may be '')."""
        self.tokens.extend(new_tokens)
        prefix_text = self.tokenizer.decode(
            self.tokens[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special,
        ) if self.read_offset > self.prefix_offset else ""
        full_text = self.tokenizer.decode(
            self.tokens[self.prefix_offset :], skip_special_tokens=self.skip_special
        )
        if full_text.endswith("�"):
            # incomplete multi-byte sequence: wait for more tokens
            return ""
        new_text = full_text[len(prefix_text) :]
        # slide the context window: keep the last few tokens as decode context
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.tokens)
        return new_text

    def finish(self) -> str:
        """Flush any held-back text at end of stream."""
        full_text = self.tokenizer.decode(
            self.tokens[self.prefix_offset :], skip_special_tokens=self.skip_special
        )
        prefix_text = self.tokenizer.decode(
            self.tokens[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special,
        ) if self.read_offset > self.prefix_offset else ""
        self.prefix_offset = self.read_offset = len(self.tokens)
        return full_text[len(prefix_text) :]
