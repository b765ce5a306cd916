"""Index-path correctness entries: the binary-index BM25 fast path checked
against the same ANSI-SQL oracle as the relational twin. Populated once the
index engine (SURVEY.md M2-M5) lands."""

from __future__ import annotations


def register_all(register) -> None:
    pass
