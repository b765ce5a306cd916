"""Exact duplicate-span removal (Lee et al. 2022 ExactSubstr dedup):
k-token spans occurring verbatim in >= min_docs docs get masked."""

from __future__ import annotations

import pytest

from miru_spark.pipeline.dedup import (
    duplicate_span_stats,
    duplicate_span_stats_oracle_sql,
    remove_duplicate_spans,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_stats_match_duck(spark, docs, duck):
    got = sorted(
        (int(r["doc_id"]), int(r["n_tokens"]), int(r["n_removed"]))
        for r in duplicate_span_stats(docs, k=5, min_docs=2).collect()
    )
    exp = sorted(
        (int(d), int(n), int(x))
        for d, n, x in duck.execute(
            duplicate_span_stats_oracle_sql(k=5, min_docs=2)
        ).fetchall()
    )
    assert got == exp
    assert any(x > 0 for _, _, x in got)  # the corpus genuinely has dups
    # and coverage is partial somewhere: 0 < n_removed < n_tokens (the
    # operator masks spans, it doesn't just flag whole docs)
    assert any(0 < x < n for _, n, x in got)


def test_handcrafted_semantics(spark):
    """Doc A and B share the exact 5-gram 'v w x y z'; C shares nothing.
    Covered tokens are exactly the shared span's positions."""
    rows = [
        (1, "a b v w x y z c d"),
        (2, "p q v w x y z"),
        (3, "one two three four five six"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        int(r["doc_id"]): (int(r["n_tokens"]), int(r["n_removed"]))
        for r in duplicate_span_stats(docs, k=5, min_docs=2).collect()
    }
    assert stats == {1: (9, 5), 2: (7, 5), 3: (6, 0)}
    cleaned = {
        int(r["doc_id"]): r["text_clean"]
        for r in remove_duplicate_spans(docs, k=5, min_docs=2).collect()
    }
    assert cleaned[1] == "a b c d"
    assert cleaned[2] == "p q"
    assert cleaned[3] == "one two three four five six"


def test_overlapping_spans_cover_union(spark):
    """Two docs share a 6-token run -> two overlapping 5-token dup spans;
    coverage is the union (6 tokens), not double-counted."""
    rows = [
        (1, "u v w x y z tail"),
        (2, "u v w x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        int(r["doc_id"]): int(r["n_removed"])
        for r in duplicate_span_stats(docs, k=5, min_docs=2).collect()
    }
    assert stats == {1: 6, 2: 6}


def test_short_docs_never_match(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c d e")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        int(r["doc_id"]): int(r["n_removed"])
        for r in duplicate_span_stats(docs, k=5, min_docs=2).collect()
    }
    assert stats == {1: 0, 2: 0, 3: 0}


def test_min_docs_threshold(spark):
    """min_docs=3: a span in only two docs survives."""
    rows = [
        (1, "v w x y z a"),
        (2, "v w x y z b"),
        (3, "c v w x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s2 = duplicate_span_stats(docs, k=5, min_docs=3).collect()
    assert all(int(r["n_removed"]) == 5 for r in s2)
    rows2 = rows[:2]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    s3 = duplicate_span_stats(docs2, k=5, min_docs=3).collect()
    assert all(int(r["n_removed"]) == 0 for r in s3)


def test_no_python_in_plan(spark, docs):
    df = duplicate_span_stats(docs, k=5, min_docs=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "EvalPython" not in plan
