"""A53 — rescore (ES rescore / Lucene QueryRescorer): top-window re-ranked
by a second-pass phrase query, final = qw*bm25 + rw*phrase_bm25. Pinned
against the DuckDB two-CTE twin, plus the window-bounding contract (docs
outside the first-pass window can never enter the result)."""

from __future__ import annotations

import pytest

from miru_spark.plans.rescore import rescore_oracle_sql, rescore_topk
from miru_spark.plans.search import search_phrase, search_topk

TERMS = ["order", "fast"]
PHRASE = "order fast"


@pytest.fixture(scope="module")
def pos_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("rescoreidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                positions=True, target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize("window,k", [(50, 10), (25, 25), (200, 10)])
def test_rescore_matches_oracle(pos_reader, duck, window, k):
    got = rescore_topk(
        pos_reader, TERMS, PHRASE, window_size=window, k=k,
        query_weight=1.0, rescore_weight=2.0,
    )
    exp = [
        (int(d), float(s))
        for d, s in duck.execute(
            rescore_oracle_sql(TERMS, PHRASE, window_size=window, k=k,
                               query_weight=1.0, rescore_weight=2.0)
        ).fetchall()
    ]
    assert got == exp != []


def test_phrase_hits_promoted(pos_reader):
    """A doc containing the exact phrase must outrank every doc that
    merely contains both terms, once rescore weight dominates."""
    got = rescore_topk(
        pos_reader, TERMS, PHRASE, window_size=200, k=200,
        query_weight=1.0, rescore_weight=100.0,
    )
    phrase_docs = {d for d, _ in search_phrase(pos_reader, PHRASE, k=1 << 30)}
    window_docs = [d for d, _ in got]
    n_ph = sum(1 for d in window_docs if d in phrase_docs)
    # all phrase docs inside the window come first
    assert n_ph > 0
    assert all(d in phrase_docs for d in window_docs[:n_ph])
    assert all(d not in phrase_docs for d in window_docs[n_ph:])


def test_window_bounds_the_rescore(pos_reader):
    """Rescore only reorders the window: a doc ranked below window_size in
    the first pass never appears, even if it contains the phrase."""
    first = [d for d, _ in search_topk(
        pos_reader, TERMS, mode="disjunctive", k=10**6
    )]
    w = 5
    got = {d for d, _ in rescore_topk(
        pos_reader, TERMS, PHRASE, window_size=w, k=w,
        rescore_weight=1000.0,
    )}
    assert got == set(first[:w])


def test_zero_rescore_weight_is_first_pass(pos_reader):
    got = rescore_topk(
        pos_reader, TERMS, PHRASE, window_size=50, k=10,
        rescore_weight=0.0,
    )
    base = [(d, round(s, 6)) for d, s in search_topk(
        pos_reader, TERMS, mode="disjunctive", k=10
    )]
    assert got == base


def test_validation(pos_reader):
    with pytest.raises(ValueError, match="positive"):
        rescore_topk(pos_reader, TERMS, PHRASE, window_size=0)
    with pytest.raises(ValueError, match="exceed"):
        rescore_topk(pos_reader, TERMS, PHRASE, window_size=5, k=10)
    with pytest.raises(ValueError, match="exceed"):
        rescore_oracle_sql(TERMS, PHRASE, window_size=5, k=10)
