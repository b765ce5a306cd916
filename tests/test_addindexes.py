"""A43 merge_indexes (Lucene IndexWriter.addIndexes): merging independently
built shard indexes is rank-identical to one build over the whole corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.functions.codecs import CODEC_PFOR, CODEC_VARINT
from miru_spark.index.addindexes import merge_indexes
from miru_spark.index.reader import IndexReader
from miru_spark.index.writer import build_index, delete_docs
from miru_spark.plans.search import search, search_phrase, search_topk
from miru_spark.schema import assign_doc_ids, read_corpus
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    """Two shard indexes whose LOCAL 0-based ids renumber back to the full
    corpus's ids under sequential merge, plus a full-corpus reference
    index — so rank comparisons can assert doc_id AND score equality."""
    base = tmp_path_factory.mktemp("addidx")
    corpus = assign_doc_ids(read_corpus(spark, SF_DIR)).cache()
    n = corpus.count()
    m = n // 2
    full_p = str(base / "full")
    s0_p, s1_p = str(base / "s0"), str(base / "s1")
    build_index(spark, corpus, full_p, num_partitions=4, positions=True)
    build_index(
        spark, corpus.filter(F.col("doc_id") < m), s0_p,
        num_partitions=4, positions=True,
    )
    # shard 1 rebased to its own 0-based space (an independent shard build
    # would naturally be 0-based); codec differs on purpose — the merge
    # re-encodes, so source codecs need not match
    build_index(
        spark,
        corpus.filter(F.col("doc_id") >= m).withColumn(
            "doc_id", F.col("doc_id") - m
        ),
        s1_p, num_partitions=4, positions=True, codec=CODEC_PFOR,
    )
    corpus.unpersist()
    return full_p, s0_p, s1_p, str(base)


def test_merged_index_is_rank_identical_to_full_build(spark, sharded):
    full_p, s0_p, s1_p, base = sharded
    dest = f"{base}/merged"
    man = merge_indexes(spark, [s0_p, s1_p], dest, codec=CODEC_VARINT)
    assert man["operation"] == "add_indexes"
    full, merged = IndexReader(spark, full_p), IndexReader(spark, dest)
    assert merged.n_docs == full.n_docs
    assert merged.stats["n_tokens"] == full.stats["n_tokens"]
    assert abs(merged.avgdl - full.avgdl) < 1e-9
    for q in ["the OR dup", "join AND hash", "the a NOT dup", "s*"]:
        assert search(merged, q, k=10) == search(full, q, k=10), q
    # phrase serving straight from merged positional postings
    assert search_phrase(merged, "the a", k=10) == search_phrase(
        full, "the a", k=10
    )
    # dictionary rebuilt: prefix expansion identical
    assert merged.expand_prefix("s") == full.expand_prefix("s")


def test_merge_rejects_pending_deletes(spark, sharded, tmp_path):
    full_p, s0_p, s1_p, base = sharded
    import shutil

    doomed = str(tmp_path / "s0_tomb")
    shutil.copytree(s0_p, doomed)
    delete_docs(doomed, [1, 2])
    with pytest.raises(ValueError, match="pending deletes"):
        merge_indexes(spark, [doomed, s1_p], str(tmp_path / "out"))


def test_merge_rejects_positions_mismatch(spark, sharded, tmp_path):
    full_p, s0_p, s1_p, base = sharded
    flat = str(tmp_path / "flat")
    corpus = assign_doc_ids(read_corpus(spark, SF_DIR))
    build_index(
        spark, corpus.filter(F.col("doc_id") < 50), flat, num_partitions=2,
        positions=False,
    )
    with pytest.raises(ValueError, match="positional"):
        merge_indexes(spark, [s0_p, flat], str(tmp_path / "out"))


def test_merge_needs_two_sources(spark, sharded, tmp_path):
    _, s0_p, _, _ = sharded
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, [s0_p], str(tmp_path / "out"))


def test_three_way_merge_and_composition_with_serving_features(spark, sharded):
    """Merge in three pieces (unequal sizes), then exercise NOT + boosts +
    search_after on the merged index against the full reference."""
    full_p, s0_p, s1_p, base = sharded
    corpus = assign_doc_ids(read_corpus(spark, SF_DIR))
    n = corpus.count()
    m = n // 2
    cut = m + (n - m) // 3
    s1a, s1b = f"{base}/s1a", f"{base}/s1b"
    build_index(
        spark,
        corpus.filter((F.col("doc_id") >= m) & (F.col("doc_id") < cut))
        .withColumn("doc_id", F.col("doc_id") - m),
        s1a, num_partitions=2, positions=True,
    )
    build_index(
        spark,
        corpus.filter(F.col("doc_id") >= cut).withColumn(
            "doc_id", F.col("doc_id") - cut
        ),
        s1b, num_partitions=2, positions=True,
    )
    dest = f"{base}/merged3"
    merge_indexes(spark, [s0_p, s1a, s1b], dest)
    full, merged = IndexReader(spark, full_p), IndexReader(spark, dest)
    assert search_topk(
        merged, ["the", "a"], mode="disjunctive", k=10,
        exclude=["dup"], boosts={"a": 2.0},
    ) == search_topk(
        full, ["the", "a"], mode="disjunctive", k=10,
        exclude=["dup"], boosts={"a": 2.0},
    )
    p1 = search_topk(merged, ["the"], mode="conjunctive", k=10)
    cur = (p1[-1][1], p1[-1][0])
    assert search_topk(
        merged, ["the"], mode="conjunctive", k=10, after=cur
    ) == search_topk(full, ["the"], mode="conjunctive", k=10, after=cur)
