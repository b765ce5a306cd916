"""search_many_distributed: N queries, one scan/decode/shuffle (round-4)."""

from __future__ import annotations

import pytest

from miru_spark.plans.search import search_distributed, search_many_distributed

BATCH = [
    (["the", "a"], "disjunctive"),
    (["join", "hash"], "conjunctive"),
    (["dup"], "disjunctive"),
    (["the", "nonexistentterm123"], "conjunctive"),
    (["the", "the", "a"], "disjunctive"),  # duplicate terms dedupe
]


def test_batch_matches_per_query_distributed(reader):
    got = {}
    for r in search_many_distributed(reader, BATCH, k=7).collect():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"]))
        )
    for qid, (terms, mode) in enumerate(BATCH):
        single = [
            (int(r["doc_id"]), float(r["score"]))
            for r in search_distributed(reader, terms, mode=mode, k=7).collect()
        ]
        batch_rows = sorted(
            got.get(qid, []), key=lambda t: (-t[1], t[0])
        )
        assert batch_rows == single, (qid, terms, mode)


def test_batch_single_scan_plan(reader):
    """The whole batch reads the postings ONCE: exactly one parquet scan of
    the postings dir in the physical plan."""
    df = search_many_distributed(reader, BATCH, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2  # postings + (possible) reuse
    # tombstone-free fixture: no anti-join stage
    assert "postings" in plan


def test_batch_validation(reader):
    with pytest.raises(ValueError, match="empty query batch"):
        search_many_distributed(reader, [])
    with pytest.raises(ValueError, match="unknown mode"):
        search_many_distributed(reader, [(["a"], "weird")])
    with pytest.raises(ValueError, match="empty term list"):
        search_many_distributed(reader, [([], "disjunctive")])
