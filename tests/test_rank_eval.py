"""rank_eval (ES _rank_eval): offline ranking-quality metrics."""

from __future__ import annotations

import math

import pytest

from miru_spark.plans.rankeval import (
    rank_eval,
    rank_eval_oracle_sql,
    synthetic_ratings,
)
from miru_spark.schema import read_corpus
from tests.conftest import SF_DIR

QUERIES = {
    "q_conj": (["join", "hash"], "conjunctive"),
    "q_disj": (["the", "dup"], "disjunctive"),
    "q_rare": (["dup"], "conjunctive"),
    "q_missing": (["the", "zzz_not_in_vocab"], "disjunctive"),
}


@pytest.fixture(scope="module")
def corpus(spark):
    return read_corpus(spark, SF_DIR)


def test_rank_eval_matches_oracle(spark, duck, reader, corpus):
    got = [tuple(r) for r in rank_eval(spark, reader, corpus, QUERIES, k=10).collect()]
    want = [tuple(r) for r in duck.execute(rank_eval_oracle_sql(QUERIES, k=10)).fetchall()]
    assert got == want and len(got) == len(QUERIES)


def test_rank_eval_handcrafted(spark, reader, corpus):
    """Recompute every metric from first principles off the engine's own
    ranking and the judgment set."""
    from miru_spark.plans.search import search_topk

    rows = {r.query_id: r for r in rank_eval(spark, reader, corpus, QUERIES, k=10).collect()}
    for qid, (terms, mode) in QUERIES.items():
        ranking = [d for d, _ in search_topk(reader, terms, mode=mode, k=10)]
        grades = {
            r.doc_id: r.grade for r in synthetic_ratings(corpus, terms).collect()
        }
        rel = [grades.get(d, 0) for d in ranking]
        # ES precision@k divides by the retrieved count (< k when fewer match)
        p = sum(1 for g in rel if g > 0) / len(ranking)
        recall = (
            sum(1 for g in rel if g > 0) / len(grades) if grades else 0.0
        )
        mrr = 0.0
        for i, g in enumerate(rel, start=1):
            if g > 0:
                mrr = 1.0 / i
                break
        dcg = sum(
            (2.0**g - 1.0) / math.log2(i + 1.0) for i, g in enumerate(rel, start=1)
        )
        ideal = sorted(grades.values(), reverse=True)[:10]
        idcg = sum(
            (2.0**g - 1.0) / math.log2(i + 1.0) for i, g in enumerate(ideal, start=1)
        )
        ndcg = dcg / idcg if idcg else 0.0
        r = rows[qid]
        assert r.p_at_k == round(p, 6), qid
        assert r.recall_at_k == round(recall, 6), qid
        assert r.mrr == round(mrr, 6), qid
        assert r.ndcg == round(ndcg, 6), qid


def test_rank_eval_degenerate_and_validation(spark, reader, corpus):
    r = {x.query_id: x for x in rank_eval(spark, reader, corpus, QUERIES, k=10).collect()}
    # the absent-term disjunctive query has an EMPTY judgment set: every
    # metric must coalesce to 0 rather than NULL/NaN
    rm = r["q_missing"]
    assert (rm.p_at_k, rm.recall_at_k, rm.mrr, rm.ndcg) == (0.0, 0.0, 0.0, 0.0)
    # a ranking whose every hit is relevant pins p_at_k and mrr
    assert r["q_conj"].mrr == 1.0
    assert 0.0 <= r["q_conj"].ndcg <= 1.0
    with pytest.raises(ValueError):
        rank_eval(spark, reader, corpus, QUERIES, k=0)
    with pytest.raises(ValueError):
        rank_eval(spark, reader, corpus, {}, k=10)


def test_rank_eval_rejects_empty_ranking(spark, reader, corpus):
    """A query with no matching docs is an error (ES returns an error
    detail), not a silent row of zeros."""
    bad = {"q_dead": (["zzz_not_in_vocab"], "conjunctive")}
    with pytest.raises(ValueError, match="no results"):
        rank_eval(spark, reader, corpus, bad, k=10)
