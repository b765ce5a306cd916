"""A80 — has_child / has_parent (ES join field / Lucene block join) over
the repo (parent) -> file (child) hierarchy. Pinned value-for-value
against DuckDB GROUP-BY twins per score_mode, plus the ES semantics:
child-count bounds, parent-score inheritance, filter-context constant
scores, and tombstoned children never resurfacing in the fan-out."""

from __future__ import annotations

import pytest

from miru_spark.plans.blockjoin import (
    has_child_oracle_sql,
    has_parent_oracle_sql,
    search_has_child,
    search_has_parent,
)
from miru_spark.plans.search import search_topk

TERMS = ["join", "hash"]


def _child(reader, duck, **kw):
    got = [
        (r.repo, r.score, r.n_children)
        for r in search_has_child(reader, TERMS, **kw).collect()
    ]
    exp = [
        (rp, float(s), int(n))
        for rp, s, n in duck.execute(
            has_child_oracle_sql(TERMS, **kw)
        ).fetchall()
    ]
    return got, exp


def _parent(reader, duck, **kw):
    got = [
        (r.doc_id, r.score)
        for r in search_has_parent(reader, TERMS, **kw).collect()
    ]
    exp = [
        (int(d), float(s))
        for d, s in duck.execute(has_parent_oracle_sql(TERMS, **kw)).fetchall()
    ]
    return got, exp


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "min", "none"])
def test_has_child_matches_oracle(reader, duck, score_mode):
    got, exp = _child(reader, duck, score_mode=score_mode)
    assert got == exp != []


def test_has_child_children_bounds(reader, duck):
    got, exp = _child(reader, duck, score_mode="sum", min_children=3,
                      max_children=20)
    assert got == exp
    assert all(3 <= n <= 20 for _, _, n in got)


def test_has_child_conjunctive_not(reader, duck):
    got, exp = _child(reader, duck, mode="conjunctive", exclude=["dup"])
    assert got == exp != []


def test_has_child_max_is_best_child(reader):
    """score_mode=max: each parent's score equals its best child's rounded
    BM25 from the flat ranking — the ToParentBlockJoin contract."""
    hits = search_topk(reader, TERMS, mode="disjunctive", k=100000)
    dm = {
        r.doc_id: r.repo
        for r in reader.docmap_df().select("doc_id", "repo").collect()
    }
    best: dict[str, float] = {}
    for d, s in hits:
        rp = dm[d]
        best[rp] = max(best.get(rp, 0.0), round(s, 6))
    got = search_has_child(reader, TERMS, score_mode="max", k=1000).collect()
    assert {r.repo: r.score for r in got} == pytest.approx(best)


@pytest.mark.parametrize("score", [True, False], ids=["scored", "filter"])
def test_has_parent_matches_oracle(reader, duck, score):
    got, exp = _parent(reader, duck, score=score, k=50)
    assert got == exp != []


def test_has_parent_fans_out_all_children(reader):
    """Every live child of a qualifying repo is returned, children of
    non-qualifying repos never are."""
    rows = search_has_parent(reader, ["dup"], k=100000).collect()
    got_ids = {r.doc_id for r in rows}
    dm = reader.docmap_df().select("doc_id", "repo").collect()
    matching = {r[0] for r in search_topk(reader, ["dup"], k=100000)}
    qual = {r.repo for r in dm if r.doc_id in matching}
    assert got_ids == {r.doc_id for r in dm if r.repo in qual}
    assert got_ids > matching  # siblings came along: a join, not a filter


def test_has_parent_tombstoned_sibling_dropped(spark, tmp_path):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index, delete_docs
    from miru_spark.schema import read_corpus

    p = str(tmp_path / "idx")
    build_index(spark, read_corpus(spark, "/root/testdata/sf0.001"), p,
                num_partitions=4)
    r = IndexReader(spark, p)
    base = {x.doc_id for x in search_has_parent(r, TERMS, k=100000).collect()}
    victim = sorted(base)[0]
    delete_docs(p, [victim])
    after = {
        x.doc_id
        for x in search_has_parent(
            IndexReader(spark, p), TERMS, k=100000
        ).collect()
    }
    assert after == base - {victim}


def test_validation(reader):
    with pytest.raises(ValueError, match="score_mode"):
        search_has_child(reader, TERMS, score_mode="nope")
    with pytest.raises(ValueError, match="min_children"):
        search_has_child(reader, TERMS, min_children=0)
    with pytest.raises(ValueError, match="max_children"):
        search_has_child(reader, TERMS, min_children=3, max_children=2)
