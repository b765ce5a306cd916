"""A76 — index sorting + early-terminated serving."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import bm25_sorted_early_oracle_sql
from miru_spark.plans.search import search_sorted_topk, search_topk


@pytest.fixture(scope="module")
def sorted_reader(spark, tmp_path_factory):
    from miru_spark.functions.tokenize import doc_len_col
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus, reassign_ids_sorted
    from tests.conftest import SF_DIR

    corpus = reassign_ids_sorted(read_corpus(spark, SF_DIR), doc_len_col("content"))
    p = str(tmp_path_factory.mktemp("srtidx") / "idx")
    build_index(spark, corpus, p, num_partitions=4, target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join", "hash"], "conjunctive"),
     (["dup"], "disjunctive"), (["join", "zzz_missing"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_sorted_early_matches_oracle(sorted_reader, duck, terms, mode):
    got = search_sorted_topk(sorted_reader, terms, mode=mode, k=10)
    exp = duck.execute(bm25_sorted_early_oracle_sql(terms, mode, k=10)).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_sorted_early_actually_terminates_early(sorted_reader):
    """The point: a dense query on the sorted index decodes a strict
    prefix of the posting chunks, and the returned docs are the k
    SHORTEST matching docs (ids rank by doc_len)."""
    stats = {}
    res = search_sorted_topk(sorted_reader, ["the", "a"], mode="conjunctive",
                             k=5, stats=stats)
    assert len(res) == 5
    assert stats["chunks_decoded"] < stats["chunks_total"]
    # ids ascend (= doc_len ascends under the remap)
    ids = [d for d, _ in res]
    assert ids == sorted(ids)
    # doc set == the 5 lowest-id members of the full candidate set
    full = {d for d, _ in search_topk(sorted_reader, ["the", "a"],
                                      mode="conjunctive", k=10**9)}
    assert set(ids) == set(sorted(full)[:5])


def test_sorted_early_scores_match_standard_scorer(sorted_reader):
    """BM25 values are unchanged by the id remap: every returned score
    equals the standard scorer's score for the same doc."""
    res = search_sorted_topk(sorted_reader, ["join", "hash"],
                             mode="conjunctive", k=10)
    full = dict(search_topk(sorted_reader, ["join", "hash"],
                            mode="conjunctive", k=10**9))
    assert res and all(abs(full[d] - s) <= 1.1e-6 for d, s in res)


def test_sorted_early_validation(sorted_reader):
    with pytest.raises(ValueError):
        search_sorted_topk(sorted_reader, [], k=5)
    with pytest.raises(ValueError):
        search_sorted_topk(sorted_reader, ["the"], mode="nope")
