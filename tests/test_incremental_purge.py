"""Purge on incrementally-finalized indexes (round-4: the r3 guard removed).

The hazard the old NotImplementedError guarded against: the streaming
finalize's delta-merge re-reads the segments/batch=N checkpoint, so a purge
that only rewrote chunk rows would let the NEXT finalize resurrect dead
postings. purge_deleted now rewrites the segment checkpoint in the same
decode-filter-reencode pass (crash-safe sentinel swap). These tests pin:
purge works, scores match a fresh build of the surviving corpus, and —
the regression that mattered — a post-purge delta-merge does NOT bring
deleted docs back.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.index.reader import IndexReader
from miru_spark.index.writer import build_index, delete_docs, purge_deleted
from miru_spark.plans.search import search_topk
from miru_spark.schema import read_corpus

SF_DIR = "/root/testdata/sf0.001"

DEAD = [5, 42, 170]


def _stream_in(spark, src_dir, idx, positions=False):
    from miru_spark.streaming.incremental import (
        incremental_index_stream,
        stream_corpus,
    )

    q = incremental_index_stream(
        stream_corpus(spark, src_dir), idx, docs_per_part=63,
        num_partitions=8, positions=positions,
    )
    q.awaitTermination(120)


def test_incremental_purge_and_delta_merge(spark, tmp_path):
    from miru_spark.streaming.incremental import finalize_streamed_index

    corpus = read_corpus(spark, SF_DIR)
    drops = str(tmp_path / "drops")
    idx = str(tmp_path / "idx")

    # drop 1 -> finalize (establishes _merged.json: incremental layout)
    corpus.filter(F.col("doc_id") < 400).coalesce(1).write.mode(
        "append"
    ).parquet(drops)
    _stream_in(spark, drops, idx, positions=True)
    finalize_streamed_index(spark, idx, target_chunk=64)

    delete_docs(idx, DEAD)
    stats = purge_deleted(spark, idx)
    assert stats["n_docs"] == 400 - len(DEAD)

    r = IndexReader(spark, idx)
    assert r.tombstones is None or r.tombstones.size == 0

    # scores match a fresh batch build over the surviving docs (same
    # tokenizer; positional so phrase paths stay exercised)
    fresh_p = str(tmp_path / "fresh")
    build_index(
        spark,
        corpus.filter((F.col("doc_id") < 400) & ~F.col("doc_id").isin(DEAD)),
        fresh_p, num_partitions=4, positions=True,
    )
    fresh = IndexReader(spark, fresh_p)
    for terms, mode in [(["the", "a"], "disjunctive"), (["join", "hash"], "conjunctive")]:
        assert search_topk(r, terms, mode=mode, k=10) == search_topk(
            fresh, terms, mode=mode, k=10
        ), (terms, mode)

    # ---- the zombie regression: new docs arrive, delta-merge re-reads the
    # segment checkpoint; dead docs must NOT resurrect
    corpus.filter(F.col("doc_id") >= 400).coalesce(1).write.mode(
        "append"
    ).parquet(drops)
    _stream_in(spark, drops, idx, positions=True)
    finalize_streamed_index(spark, idx, target_chunk=64)

    r2 = IndexReader(spark, idx)
    fresh2_p = str(tmp_path / "fresh2")
    build_index(
        spark, corpus.filter(~F.col("doc_id").isin(DEAD)), fresh2_p,
        num_partitions=4, positions=True,
    )
    fresh2 = IndexReader(spark, fresh2_p)
    for terms, mode in [
        (["the"], "disjunctive"),
        (["the", "a"], "disjunctive"),
        (["join", "hash"], "conjunctive"),
    ]:
        got = search_topk(r2, terms, mode=mode, k=20)
        assert not ({d for d, _ in got} & set(DEAD)), (terms, mode)
        assert got == search_topk(fresh2, terms, mode=mode, k=20), (terms, mode)


def test_incremental_purge_idempotent_rerun(spark, tmp_path):
    """Re-running purge on an already-purged incremental index is a no-op
    (the crash-recovery contract: tombstones drive the rewrite)."""
    from miru_spark.streaming.incremental import finalize_streamed_index

    corpus = read_corpus(spark, SF_DIR)
    drops = str(tmp_path / "drops")
    idx = str(tmp_path / "idx")
    corpus.coalesce(1).write.mode("append").parquet(drops)
    _stream_in(spark, drops, idx)
    finalize_streamed_index(spark, idx, target_chunk=64)
    delete_docs(idx, DEAD)
    purge_deleted(spark, idx)
    before = search_topk(IndexReader(spark, idx), ["the", "a"], mode="disjunctive", k=10)
    with pytest.raises(ValueError, match="no doc_ids"):
        delete_docs(idx, [])
    # purge with no tombstones: returns stats unchanged, index untouched
    stats = purge_deleted(spark, idx)
    assert stats["n_docs"] == 500 - len(DEAD)
    after = search_topk(IndexReader(spark, idx), ["the", "a"], mode="disjunctive", k=10)
    assert after == before
