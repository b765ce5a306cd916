"""Proximity search ('"a b"~N') from the positional index."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import bm25_near_oracle_sql
from miru_spark.plans.search import parse_query, search, search_near


@pytest.fixture(scope="module")
def pos_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("nearidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
                positions=True, target_chunk=64)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "ta,tb,slop",
    [("join", "hash", 1), ("join", "hash", 2), ("the", "dup", 5),
     ("the", "a", 1), ("join", "zzz_missing", 3)],
    ids=lambda x: str(x),
)
def test_near_matches_oracle(pos_reader, duck, ta, tb, slop):
    got = [(d, round(s, 6)) for d, s in search_near(pos_reader, ta, tb, slop=slop)]
    want = [
        (d, s)
        for d, s in duck.execute(bm25_near_oracle_sql(ta, tb, slop=slop)).fetchall()
    ]
    assert got == want


def test_near_monotone_in_slop(pos_reader):
    """Widening slop only ADDS candidate docs (nested result sets)."""
    tight = {d for d, _ in search_near(pos_reader, "the", "dup", slop=1, k=1000)}
    wide = {d for d, _ in search_near(pos_reader, "the", "dup", slop=8, k=1000)}
    assert tight <= wide and len(wide) > len(tight)


def test_near_via_parser(pos_reader):
    assert parse_query('"join hash"~2') == (["join", "hash"], "near:2", [])
    assert search(pos_reader, '"join hash"~2', k=5) == search_near(
        pos_reader, "join", "hash", slop=2, k=5
    )
    # 3+-term ~N routes to the sloppy phrase (A71), no longer an error
    from miru_spark.plans.search import search_phrase_sloppy

    assert search(pos_reader, '"the a data"~2', k=5) == search_phrase_sloppy(
        pos_reader, "the a data", slop=2, k=5
    )
    with pytest.raises(ValueError):
        search_near(pos_reader, "the", "the", slop=1)


# ---- ordered proximity (Lucene span_near inOrder=true) ---------------------


@pytest.mark.parametrize(
    "ta,tb,slop",
    [("join", "hash", 2), ("the", "a", 1), ("the", "dup", 5)],
    ids=lambda x: str(x),
)
def test_near_ordered_matches_oracle(pos_reader, duck, ta, tb, slop):
    got = search_near(pos_reader, ta, tb, slop=slop, k=10, in_order=True)
    exp = duck.execute(
        bm25_near_oracle_sql(ta, tb, slop=slop, k=10, in_order=True)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_ordered_union_is_unordered(pos_reader):
    """ordered(a,b) ∪ ordered(b,a) must equal unordered(a,b) as doc sets:
    every near pair is b-after-a or a-after-b."""
    a, b, slop = "the", "a", 2
    un = {d for d, _ in search_near(pos_reader, a, b, slop=slop, k=10**9)}
    ab = {d for d, _ in search_near(pos_reader, a, b, slop=slop, k=10**9,
                                    in_order=True)}
    ba = {d for d, _ in search_near(pos_reader, b, a, slop=slop, k=10**9,
                                    in_order=True)}
    assert ab | ba == un
    assert ab <= un and ba <= un
    # non-vacuous asymmetry: the two directions genuinely differ somewhere
    assert ab != ba or not un


# ---- span_first (Lucene SpanFirstQuery: term within first N positions) -----


@pytest.mark.parametrize(
    "term,end",
    [("the", 5), ("join", 10), ("dup", 3), ("the", 1), ("zzz_missing", 4)],
    ids=lambda x: str(x),
)
def test_span_first_matches_oracle(pos_reader, duck, term, end):
    from miru_spark.plans.relational import bm25_span_first_oracle_sql
    from miru_spark.plans.search import search_span_first

    got = search_span_first(pos_reader, term, end, k=10)
    exp = duck.execute(bm25_span_first_oracle_sql(term, end, k=10)).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_span_first_monotone_and_degenerate(pos_reader):
    """Widening the window only ADDS docs; end >= max doc_len equals the
    plain single-term ranking (rounded)."""
    from miru_spark.plans.search import search, search_span_first

    tight = {d for d, _ in search_span_first(pos_reader, "the", 2, k=10**9)}
    wide = {d for d, _ in search_span_first(pos_reader, "the", 50, k=10**9)}
    assert tight <= wide and len(wide) > len(tight)
    full = search_span_first(pos_reader, "the", 10**6, k=10)
    plain = [(d, round(s, 6)) for d, s in search(pos_reader, "the", k=10)]
    assert full == plain
    with pytest.raises(ValueError):
        search_span_first(pos_reader, "the", 0)


# ---- sloppy n-term phrase (ES match_phrase slop, alignment window) ---------


@pytest.mark.parametrize(
    "phrase,slop",
    [("the a data", 2), ("the a data", 0), ("join hash the", 4),
     ("the a", 3), ("the the a", 2), ("the zzz_missing a", 5)],
    ids=lambda x: str(x),
)
def test_sloppy_phrase_matches_oracle(pos_reader, duck, phrase, slop):
    from miru_spark.plans.relational import bm25_sloppy_phrase_oracle_sql
    from miru_spark.plans.search import search_phrase_sloppy

    got = search_phrase_sloppy(pos_reader, phrase, slop=slop, k=10)
    exp = duck.execute(
        bm25_sloppy_phrase_oracle_sql(phrase.split(), slop, k=10)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_sloppy_phrase_properties(pos_reader):
    """slop=0 == exact consecutive phrase (doc sets); match set is
    monotone in slop; validation errors."""
    from miru_spark.plans.search import search_phrase, search_phrase_sloppy

    s0 = {d for d, _ in search_phrase_sloppy(pos_reader, "the a", 0, k=10**9)}
    ex = {d for d, _ in search_phrase(pos_reader, "the a", k=10**9)}
    assert s0 == ex and s0
    tight = {d for d, _ in search_phrase_sloppy(pos_reader, "the a data", 1, k=10**9)}
    wide = {d for d, _ in search_phrase_sloppy(pos_reader, "the a data", 6, k=10**9)}
    assert tight <= wide
    with pytest.raises(ValueError):
        search_phrase_sloppy(pos_reader, "single", 2)
    with pytest.raises(ValueError):
        search_phrase_sloppy(pos_reader, "the a", -1)


# ---- span_not (Lucene SpanNotQuery: positional exclusion) -------------------


@pytest.mark.parametrize(
    "term,excl,pre,post",
    [("dup", "hash", 5, 5), ("dup", "hash", 2, 2), ("the", "a", 1, 1),
     ("dup", "zzz_missing", 3, 3), ("the", "dup", 0, 0)],
    ids=lambda x: str(x),
)
def test_span_not_matches_oracle(pos_reader, duck, term, excl, pre, post):
    from miru_spark.plans.relational import bm25_span_not_oracle_sql
    from miru_spark.plans.search import search_span_not

    got = search_span_not(pos_reader, term, excl, pre, post, k=10)
    exp = duck.execute(
        bm25_span_not_oracle_sql(term, excl, pre, post, k=10)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_span_not_semantics(pos_reader):
    """Narrowing the window only ADDS docs; absent exclusion term equals the
    plain ranking; span_not is strictly finer than boolean NOT (a doc with
    both terms far apart matches span_not but never NOT)."""
    from miru_spark.plans.search import search, search_span_not, search_topk

    wide = {d for d, _ in search_span_not(pos_reader, "dup", "hash", 9, 9, k=10**9)}
    tight = {d for d, _ in search_span_not(pos_reader, "dup", "hash", 1, 1, k=10**9)}
    assert wide <= tight
    absent = search_span_not(pos_reader, "dup", "zzz_missing", 5, 5, k=10)
    plain = [(d, round(s, 6)) for d, s in search(pos_reader, "dup", k=10)]
    assert absent == plain
    bool_not = {d for d, _ in search_topk(pos_reader, ["dup"], exclude=["hash"],
                                          k=10**9)}
    span_not = {d for d, _ in search_span_not(pos_reader, "dup", "hash", 5, 5,
                                              k=10**9)}
    assert bool_not <= span_not  # NOT removes every co-occurrence; span_not only near ones
    assert bool_not != span_not  # ... and the difference is non-vacuous here


def test_span_not_asymmetric_window(pos_reader):
    """pre-only and post-only windows differ (direction matters), and both
    are supersets of the symmetric window's matches."""
    from miru_spark.plans.search import search_span_not

    pre_only = {d for d, _ in search_span_not(pos_reader, "the", "a", 3, 0, k=10**9)}
    post_only = {d for d, _ in search_span_not(pos_reader, "the", "a", 0, 3, k=10**9)}
    sym = {d for d, _ in search_span_not(pos_reader, "the", "a", 3, 3, k=10**9)}
    assert sym <= pre_only and sym <= post_only
    assert pre_only != post_only
    with pytest.raises(ValueError):
        search_span_not(pos_reader, "the", "the", 1, 1)
    with pytest.raises(ValueError):
        search_span_not(pos_reader, "the", "a", -1, 0)


# ---- span_within / span_containing (Lucene enclosure duality) ---------------


@pytest.mark.parametrize(
    "ta,tb,little,slop",
    [("the", "a", "data", 6), ("the", "a", "data", 2), ("join", "sort", "hash", 10),
     ("the", "a", "zzz_missing", 6), ("the", "zzz_missing", "data", 6),
     ("a", "the", "data", 6)],
    ids=lambda x: str(x),
)
def test_span_within_matches_oracle(pos_reader, duck, ta, tb, little, slop):
    from miru_spark.plans.relational import bm25_span_enclosure_oracle_sql
    from miru_spark.plans.search import search_span_within

    got = search_span_within(pos_reader, ta, tb, little, slop, k=10)
    exp = duck.execute(
        bm25_span_enclosure_oracle_sql(ta, tb, little, slop, "little", k=10)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


@pytest.mark.parametrize(
    "ta,tb,little,slop",
    [("the", "a", "data", 6), ("join", "sort", "hash", 10), ("the", "a", "dup", 8)],
    ids=lambda x: str(x),
)
def test_span_containing_matches_oracle(pos_reader, duck, ta, tb, little, slop):
    from miru_spark.plans.relational import bm25_span_enclosure_oracle_sql
    from miru_spark.plans.search import search_span_containing

    got = search_span_containing(pos_reader, ta, tb, little, slop, k=10)
    exp = duck.execute(
        bm25_span_enclosure_oracle_sql(ta, tb, little, slop, "big", k=10)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_span_enclosure_reference_bruteforce(pos_reader, spark):
    """Pure-Python reference over the raw corpus tokens: a doc matches iff
    some little occurrence sits inside an ordered a..b window of width
    <= slop. Both public functions must return exactly this doc set."""
    from miru_spark.plans.search import (
        search_span_containing,
        search_span_within,
    )
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    ta, tb, little, slop = "the", "a", "data", 6
    expected = set()
    for r in read_corpus(spark, SF_DIR).select("doc_id", "content").collect():
        toks = [t for t in r.content.split(" ") if t]
        pa = [i for i, t in enumerate(toks) if t == ta]
        pb = [i for i, t in enumerate(toks) if t == tb]
        pt = [i for i, t in enumerate(toks) if t == little]
        if any(
            a <= t <= b and 1 <= b - a <= slop
            for t in pt for a in pa for b in pb
        ):
            expected.add(int(r.doc_id))
    within = {d for d, _ in search_span_within(pos_reader, ta, tb, little,
                                               slop, k=10**9)}
    containing = {d for d, _ in search_span_containing(pos_reader, ta, tb,
                                                       little, slop, k=10**9)}
    assert within == expected
    assert containing == expected  # same enclosure predicate, dual scoring


def test_span_enclosure_semantics(pos_reader):
    """Within/containing share the doc set but score different clauses:
    within == little's single-term BM25 on that set, containing == the big
    pair's conjunctive BM25. Widening slop only adds docs. Validation:
    slop < 1, identical endpoints, non-positional index all reject."""
    from miru_spark.plans.search import (
        search_span_containing,
        search_span_within,
        search_topk,
    )

    ta, tb, little, slop = "the", "a", "data", 6
    within = dict(search_span_within(pos_reader, ta, tb, little, slop, k=10**9))
    containing = dict(
        search_span_containing(pos_reader, ta, tb, little, slop, k=10**9)
    )
    assert set(within) == set(containing) and within
    little_scores = dict(
        (d, round(s, 6))
        for d, s in search_topk(pos_reader, [little], k=10**9)
    )
    pair_scores = dict(
        (d, round(s, 6))
        for d, s in search_topk(pos_reader, [ta, tb], mode="conjunctive",
                                k=10**9)
    )
    assert all(within[d] == little_scores[d] for d in within)
    assert all(containing[d] == pair_scores[d] for d in containing)
    tight = {d for d, _ in search_span_within(pos_reader, ta, tb, little, 2,
                                              k=10**9)}
    assert tight <= set(within)
    with pytest.raises(ValueError):
        search_span_within(pos_reader, "the", "a", "data", 0)
    with pytest.raises(ValueError):
        search_span_containing(pos_reader, "the", "the", "data", 3)
