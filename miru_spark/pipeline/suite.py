"""Training-data pipeline operator suite: dedup, similarity search, text
analysis, multimodal plumbing. Populated as operators land."""

from __future__ import annotations


def register_all(register) -> None:
    pass
