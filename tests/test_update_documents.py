"""Document update/upsert (Lucene IndexWriter.updateDocument parity):
tombstone the replaced version + index the new version as a delta batch +
delta-merge finalize. See streaming/incremental.py update_documents."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.schema import read_corpus
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def upd_index(spark, tmp_path_factory):
    """Incremental index of sf0.001, then update 2 docs + insert 1 new."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk
    from miru_spark.streaming.incremental import (
        finalize_streamed_index,
        incremental_index_stream,
        stream_corpus,
        update_documents,
    )

    drops = str(tmp_path_factory.mktemp("upd_drops"))
    corpus = read_corpus(spark, SF_DIR)
    corpus.filter(F.col("doc_id") < 250).coalesce(1).write.mode("append").parquet(drops)
    corpus.filter(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(drops)

    idx = str(tmp_path_factory.mktemp("upd_idx") / "i")
    q = incremental_index_stream(
        stream_corpus(spark, drops), idx, docs_per_part=63, num_partitions=8
    )
    q.awaitTermination(120)
    finalize_streamed_index(spark, idx, num_partitions=8, target_chunk=64)
    reader0 = IndexReader(spark, idx)
    # pre-update hit lists for the replaced docs' own content
    pre = {
        d: search_topk(reader0, ["the"], mode="disjunctive", k=10**9)
        for d in (7, 11)
    }

    old = corpus.filter(F.col("doc_id").isin([7, 11])).select(
        "doc_id", "repo", "path", "commit", "lang"
    )
    updates = old.withColumn(
        "content", F.lit("zzzupdated join hash zzzupdated")
    )
    insert = spark.createDataFrame(
        [(None, "newrepo", "brand_new.txt", "v1", "en",
          "zzzinserted scan table")],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    res = update_documents(
        spark, idx, updates.unionByName(insert), num_partitions=8
    )
    return idx, res, pre


def test_update_replaces_and_inserts(spark, upd_index):
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk

    idx, res, _ = upd_index
    assert res["n_updated"] == 2 and res["n_inserted"] == 1
    id_map = dict(res["id_map"])
    assert set(id_map) == {7, 11}
    r = IndexReader(spark, idx)
    # the new content is served under the NEW ids, exactly those
    hits = {d for d, _ in search_topk(r, ["zzzupdated"], mode="conjunctive", k=100)}
    assert hits == set(id_map.values())
    ins = {d for d, _ in search_topk(r, ["zzzinserted"], mode="conjunctive", k=100)}
    assert len(ins) == 1 and not (ins & set(id_map.values()))
    assert min(ins) > max(id_map)  # fresh ids, never reused


def test_old_versions_never_served(spark, upd_index):
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_count, search_topk

    idx, res, pre = upd_index
    r = IndexReader(spark, idx)
    old_ids = set(dict(res["id_map"]))
    # every query that used to return an updated doc no longer returns its
    # old id (tombstone filtering on the serving paths)
    for terms in (["the"], ["a"], ["the", "a"]):
        got = {d for d, _ in search_topk(r, terms, mode="disjunctive", k=10**9)}
        assert not (got & old_ids)
    # pre-update, doc 7/11 did appear for 'the' (sanity of the fixture)
    assert any(d in {doc for doc, _ in pre[7]} for d in (7, 11))
    n = search_count(r, ["zzzupdated"]).collect()[0][0]
    assert n == 2


def test_unchanged_docs_still_served(spark, upd_index):
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk

    idx, res, pre = upd_index
    r = IndexReader(spark, idx)
    got = {d for d, _ in search_topk(r, ["the"], mode="disjunctive", k=10**9)}
    want = {d for d, _ in pre[7] if d not in (7, 11)}
    # same doc SET (scores/order drift slightly: stats now count the
    # superseded versions too — documented Lucene pre-merge semantics);
    # the update/insert contents contain no 'the', so no new ids appear
    assert got == want


def test_update_requires_incremental_layout(spark, tmp_path, reader):
    from miru_spark.streaming.incremental import update_documents

    with pytest.raises(ValueError, match="incremental layout"):
        update_documents(
            spark,
            reader.index_path,
            spark.createDataFrame(
                [("r", "p", "v0", "en", "x")],
                "repo string, path string, commit string, lang string, content string",
            ),
        )


def test_second_update_round_trips(spark, upd_index):
    """Updating an already-updated doc works (ids keep growing, the prior
    new version is tombstoned in turn)."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk
    from miru_spark.streaming.incremental import update_documents

    idx, res, _ = upd_index
    r0 = IndexReader(spark, idx)
    new_of_7 = dict(res["id_map"])[7]
    row = (
        r0.docmap_df()
        .filter(F.col("doc_id") == new_of_7)
        .select("doc_id", "repo", "path", "commit")
        .collect()[0]
    )
    upd2 = spark.createDataFrame(
        [(row.doc_id, row.repo, row.path, row.commit, "en", "zzzfinal dup")],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    res2 = update_documents(spark, idx, upd2, num_partitions=8)
    assert res2["n_updated"] == 1
    newest = dict(res2["id_map"])[new_of_7]
    assert newest > new_of_7
    r = IndexReader(spark, idx)
    assert {d for d, _ in search_topk(r, ["zzzfinal"], mode="conjunctive", k=10)} == {newest}
    # the intermediate version is gone from serving
    assert {d for d, _ in search_topk(r, ["zzzupdated"], mode="conjunctive", k=100)} == {
        dict(res["id_map"])[11]
    }
