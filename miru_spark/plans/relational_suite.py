"""Tier-B relational operator suite (SURVEY.md section 2, B1-B26).

Each entry exercises one relational operator the engine itself uses somewhere
in the index pipeline, expressed over the driver's TPC-H-ish tables, with an
exactly-matching DuckDB oracle. Populated incrementally.
"""

from __future__ import annotations


def register_all(register) -> None:  # populated as operators land
    pass
