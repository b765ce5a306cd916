"""A63 — federated serving over shard indexes (Lucene MultiReader):
rank-identical to searching the physically merged index."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import bm25_oracle_sql
from miru_spark.plans.search import search_sharded, search_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    """Three UNEVEN shard indexes over disjoint doc_id ranges + the
    full-corpus index to compare against."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus

    base = tmp_path_factory.mktemp("shards")
    corpus = read_corpus(spark, SF_DIR)
    n = corpus.count()
    cuts = [(0, n // 5), (n // 5, n // 2), (n // 2, n)]
    readers = []
    for i, (lo, hi) in enumerate(cuts):
        p = str(base / f"s{i}")
        part = corpus.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        build_index(spark, part, p, num_partitions=2, target_chunk=64)
        readers.append(IndexReader(spark, p))
    full_p = str(base / "full")
    build_index(spark, corpus, full_p, num_partitions=4, target_chunk=64)
    return readers, IndexReader(spark, full_p)


@pytest.mark.parametrize(
    "terms,mode",
    [
        (["join", "hash"], "conjunctive"),
        (["the", "dup"], "disjunctive"),
        (["join", "hash", "dup", "sort", "merge"], "disjunctive"),
        (["zzz_missing", "join"], "disjunctive"),
    ],
)
def test_rank_identical_to_merged(shards, terms, mode):
    readers, full = shards
    got = search_sharded(readers, terms, mode=mode, k=25)
    want = [
        (d, round(s, 6))
        for d, s in search_topk(full, terms, mode=mode, k=25)
    ]
    assert got == want
    assert got or terms[0] == "zzz_missing"


def test_matches_duck_oracle(shards, duck):
    readers, _ = shards
    got = search_sharded(readers, ["the", "dup"], "disjunctive", k=10)
    exp = duck.execute(bm25_oracle_sql(["the", "dup"], "disjunctive")).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_not_and_boosts_compose(shards):
    readers, full = shards
    got = search_sharded(
        readers, ["the", "dup"], "disjunctive", k=15,
        exclude=["tree"], boosts={"dup": 0.25},
    )
    want = [
        (d, round(s, 6))
        for d, s in search_topk(
            full, ["the", "dup"], "disjunctive", k=15,
            exclude=["tree"], boosts={"dup": 0.25},
        )
    ]
    assert got == want and got


def test_conjunctive_term_missing_from_one_shard(shards):
    """A term present in SOME shards but required conjunctively: docs
    only match inside shards that contain every term, but the global df
    must still sum across all shards (scores shift vs per-shard stats)."""
    readers, full = shards
    got = search_sharded(readers, ["join", "hash"], "conjunctive", k=10**9)
    want = [
        (d, round(s, 6))
        for d, s in search_topk(full, ["join", "hash"], "conjunctive", k=10**9)
    ]
    assert got == want


def test_shard_tombstones_respected(spark, tmp_path):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index, delete_docs
    from miru_spark.schema import read_corpus

    corpus = read_corpus(spark, SF_DIR)
    n = corpus.count()
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus.filter(f"doc_id < {n//2}"), p1, num_partitions=2)
    build_index(spark, corpus.filter(f"doc_id >= {n//2}"), p2, num_partitions=2)
    r1 = IndexReader(spark, p1)
    before = search_sharded([r1, IndexReader(spark, p2)], ["the"], "disjunctive", k=5)
    victim = before[0][0]
    delete_docs(p1 if victim < n // 2 else p2, [victim])
    after = search_sharded(
        [IndexReader(spark, p1), IndexReader(spark, p2)],
        ["the"], "disjunctive", k=5,
    )
    assert victim not in [d for d, _ in after]


def test_single_shard_degenerates_to_plain_search(shards):
    readers, _ = shards
    r = readers[2]
    got = search_sharded([r], ["the", "a"], "conjunctive", k=10)
    want = [
        (d, round(s, 6))
        for d, s in search_topk(r, ["the", "a"], "conjunctive", k=10)
    ]
    assert got == want


def test_validation(shards):
    readers, _ = shards
    with pytest.raises(ValueError):
        search_sharded([], ["a"])
    with pytest.raises(ValueError):
        search_sharded(readers, ["a"], mode="nope")
    with pytest.raises(ValueError):
        search_sharded(readers, ["a"], boosts={"a": -1})
    assert search_sharded(readers, ["zzz_missing"], "conjunctive") == []
