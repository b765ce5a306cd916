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


def test_update_rejects_duplicate_keys(spark, upd_index):
    """Two update rows for one (repo, path, commit) are ambiguous — the
    old->new id join would fan out — so the batch is rejected up front."""
    from miru_spark.streaming.incremental import update_documents

    idx, _, _ = upd_index
    dup = spark.createDataFrame(
        [(None, "r", "same.txt", "v1", "en", "first version"),
         (None, "r", "same.txt", "v1", "en", "second version")],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    with pytest.raises(ValueError, match="duplicate"):
        update_documents(spark, idx, dup, num_partitions=8)


def _chunk_spans(spark, idx, term):
    post = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term") == term)
        .select("bucket", "first_docid", "last_docid")
        .orderBy("bucket", "first_docid")
        .collect()
    )
    return [(r.first_docid, r.last_docid) for r in post]


def test_bulk_update_keeps_chunk_order(spark, tmp_path):
    """A delta batch LARGER than docs_per_part*num_partitions must bucket
    with the stream's divisor: a batch-sized divisor would give the new
    (higher) doc_ids pids that interleave with the old pid ranges, chunk
    docid ranges would overlap, and seeks/WAND would silently miss docs."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk
    from miru_spark.streaming.incremental import (
        finalize_streamed_index,
        incremental_index_stream,
        stream_corpus,
        update_documents,
    )

    drops = str(tmp_path / "drops")
    read_corpus(spark, SF_DIR).coalesce(1).write.parquet(drops)
    idx = str(tmp_path / "idx")
    q = incremental_index_stream(
        stream_corpus(spark, drops), idx, docs_per_part=63, num_partitions=8
    )
    q.awaitTermination(120)
    finalize_streamed_index(spark, idx, num_partitions=8, target_chunk=64)
    r0 = IndexReader(spark, idx)
    old_the = {d for d, _ in search_topk(r0, ["the"], mode="disjunctive", k=10**9)}
    assert old_the  # fixture sanity

    # 600 pure inserts > 63*8: the old bug derived dpp=ceil(600/8)=75 here
    n_bulk = 600
    bulk = spark.createDataFrame(
        [(None, "bulkrepo", f"f{i}.txt", "v1", "en", f"the zzzbulk word{i}")
         for i in range(n_bulk)],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    res = update_documents(spark, idx, bulk, num_partitions=8)
    assert res["n_inserted"] == n_bulk and res["n_updated"] == 0

    # chunk docid ranges stay globally ordered per term (the merge invariant)
    spans = _chunk_spans(spark, idx, "the")
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:])), spans
    # and serving returns EVERY doc: all old hits plus all 600 inserts
    r = IndexReader(spark, idx)
    got = {d for d, _ in search_topk(r, ["the"], mode="disjunctive", k=10**9)}
    assert got == old_the | {
        d.doc_id
        for d in spark.read.parquet(f"{idx}/docmap")
        .filter(F.col("repo") == "bulkrepo").select("doc_id").collect()
    }
    assert len(got) == len(old_the) + n_bulk

    # pre-meta fallback: without _stream_meta.json the divisor is derived
    # from the on-disk index and the invariant still holds
    import os
    os.remove(f"{idx}/_stream_meta.json")
    more = spark.createDataFrame(
        [(None, "bulkrepo2", f"g{i}.txt", "v1", "en", f"the zzzmore word{i}")
         for i in range(40)],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    res2 = update_documents(spark, idx, more, num_partitions=8)
    assert res2["n_inserted"] == 40
    spans = _chunk_spans(spark, idx, "the")
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:])), spans
    got = {
        d for d, _ in search_topk(IndexReader(spark, idx), ["the"],
                                  mode="disjunctive", k=10**9)
    }
    assert len(got) == len(old_the) + n_bulk + 40


def test_update_inherits_recorded_tokenizer(spark, tmp_path):
    """The analyzer is index state: an update without tokenizer= reuses the
    stream's recorded one, and a conflicting override is refused."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.plans.search import search_topk
    from miru_spark.streaming.incremental import (
        finalize_streamed_index,
        incremental_index_stream,
        stream_corpus,
        update_documents,
    )

    corpus = spark.createDataFrame(
        [(i, "r", f"p{i}.py", "v0", "py", f"def Func_{i}(x): return VALUE_{i}")
         for i in range(8)],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    drops = str(tmp_path / "drops")
    corpus.coalesce(1).write.parquet(drops)
    idx = str(tmp_path / "idx")
    q = incremental_index_stream(
        stream_corpus(spark, drops), idx, docs_per_part=4, num_partitions=2,
        tokenizer="code",
    )
    q.awaitTermination(120)
    stats = finalize_streamed_index(spark, idx, num_partitions=2)
    assert stats["tokenizer"] == "code"

    upd = spark.createDataFrame(
        [(3, "r", "p3.py", "v0", "py", "def Replacement_Func(): Pass")],
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string",
    )
    with pytest.raises(ValueError, match="conflicts with"):
        update_documents(spark, idx, upd, num_partitions=2,
                         tokenizer="whitespace")
    res = update_documents(spark, idx, upd, num_partitions=2)  # inherits
    new_id = dict(res["id_map"])[3]
    r = IndexReader(spark, idx)
    # code-mode semantics: lowercased identifier with underscore kept whole
    assert {d for d, _ in search_topk(r, ["replacement_func"], "conjunctive", k=10)} == {new_id}


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
