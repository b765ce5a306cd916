"""A64 — percolation (reverse search): docs matched against registered
queries; must agree with the forward search path and the DuckDB twin."""

from __future__ import annotations

import pytest

from miru_spark.plans.percolate import percolate, percolate_oracle_sql

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    (1, ["join", "hash"], "conjunctive", []),
    (2, ["dup", "tree"], "disjunctive", []),
    (3, ["the"], "conjunctive", ["dup"]),
    (4, ["zzz_not_in_vocab"], "conjunctive", []),
    # duplicated term: must match like the deduped query (round-4 review
    # fix — a raw size(terms) floor made this match NOTHING)
    (5, ["join", "join", "hash"], "conjunctive", []),
]


def _qdf(spark):
    return spark.createDataFrame(
        QUERIES,
        "query_id long, terms array<string>, mode string, exclude array<string>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    from miru_spark.schema import read_corpus

    return read_corpus(spark, SF_DIR)


def test_matches_duck_oracle(spark, corpus, duck):
    got = sorted(
        (int(r["doc_id"]), int(r["query_id"]))
        for r in percolate(corpus, _qdf(spark)).collect()
    )
    exp = sorted(
        (int(d), int(q))
        for d, q in duck.execute(percolate_oracle_sql(QUERIES)).fetchall()
    )
    assert got == exp
    assert got


def test_agrees_with_forward_search(spark, corpus, reader):
    """Percolation is search transposed: the docs matched to query i must
    be exactly the forward candidate set of that query."""
    from miru_spark.plans.search import search_topk

    got = percolate(corpus, _qdf(spark)).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["doc_id"]))
    for qid, terms, mode, exclude in QUERIES:
        want = {
            d
            for d, _ in search_topk(
                reader, terms, mode=mode, k=10**9, exclude=exclude or None
            )
        }
        assert by_q.get(qid, set()) == want, qid


def test_handcrafted_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a x y"),
            (3, "b only here"),
            (4, "a b forbidden"),
        ],
        "doc_id long, content string",
    )
    qs = spark.createDataFrame(
        [
            (10, ["a", "b"], "conjunctive", None),
            (20, ["a", "b"], "disjunctive", None),
            (30, ["a", "b"], "conjunctive", ["forbidden"]),
            (40, ["a", "a", "b"], "conjunctive", None),  # dup term == query 10
        ],
        "query_id long, terms array<string>, mode string, exclude array<string>",
    )
    got = sorted(
        (int(r["doc_id"]), int(r["query_id"]))
        for r in percolate(docs, qs).collect()
    )
    assert got == [
        (1, 10), (1, 20), (1, 30), (1, 40),
        (2, 20),
        (3, 20),
        (4, 10), (4, 20), (4, 40),  # 30 excluded by 'forbidden'
    ]


def test_no_python_in_plan(spark, corpus):
    df = percolate(corpus, _qdf(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "EvalPython" not in plan
