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


def test_batch_theta_prune_identical_and_skips(reader):
    """Gate forced open: the batch prune must skip chunks for the hot
    disjunctive queries while every query's result stays identical to
    its unpruned per-query run; terms shared with a conjunctive query
    keep all their chunks (keep-if-any-query-needs-it)."""
    from pyspark.sql import functions as F

    from miru_spark.plans import search as S

    batch = [
        (["the"], "disjunctive"),
        (["the", "license"], "disjunctive"),
        (["the", "spark"], "conjunctive"),
    ]
    got = {}
    for r in search_many_distributed(reader, batch, k=5, prune_gate=0).collect():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"]))
        )
    # thetas were derived; 'the' is shared with the conjunctive query, so
    # keep-if-any-query-needs-it must protect every one of its chunks
    assert S.LAST_PRUNE_STATS.get("thetas"), S.LAST_PRUNE_STATS
    assert "the" in S.LAST_PRUNE_STATS.get("protected_terms", [])
    for qid, (terms, mode) in enumerate(batch):
        single = [
            (int(r["doc_id"]), float(r["score"]))
            for r in search_distributed(reader, terms, mode=mode, k=5).collect()
        ]
        assert sorted(got.get(qid, []), key=lambda t: (-t[1], t[0])) == single, (
            qid, terms, mode,
        )
    # direct skip evidence: the helper drops chunk rows for a hot-only batch
    all_terms = ["the", "license"]
    chunks = reader.postings_df(all_terms)
    tdf = chunks.groupBy("term").agg(F.sum("df_chunk").alias("df_global"))
    chunks = chunks.join(F.broadcast(tdf), "term")
    kept, stats = S._batch_blockmax_prune(
        chunks, [(["the", "license"], "disjunctive"), (["license"], "disjunctive")],
        3, float(reader.n_docs), float(reader.avgdl), 6,
        reader.term_dfs(all_terms), prune_gate=0,
    )
    assert stats["pruned"]
    assert kept.count() < chunks.count()


def test_batch_validation(reader):
    with pytest.raises(ValueError, match="empty query batch"):
        search_many_distributed(reader, [])
    with pytest.raises(ValueError, match="unknown mode"):
        search_many_distributed(reader, [(["a"], "weird")])
    with pytest.raises(ValueError, match="empty term list"):
        search_many_distributed(reader, [([], "disjunctive")])
