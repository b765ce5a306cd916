from __future__ import annotations

import pytest

from miru_spark.plans.search import parse_query, search, search_topk


def test_parse_query():
    assert parse_query("join AND hash") == (["join", "hash"], "conjunctive")
    assert parse_query("join OR hash OR dup") == (["join", "hash", "dup"], "disjunctive")
    assert parse_query("join hash") == (["join", "hash"], "conjunctive")
    with pytest.raises(ValueError):
        parse_query("a AND b OR c")


def test_search_wrapper_matches_topk(reader):
    assert search(reader, "join AND hash", k=5) == search_topk(
        reader, ["join", "hash"], mode="conjunctive", k=5
    )
    assert search(reader, "the OR dup", k=5) == search_topk(
        reader, ["the", "dup"], mode="disjunctive", k=5
    )
