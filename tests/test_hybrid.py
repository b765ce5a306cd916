"""A54 — hybrid lexical+vector search fused by Reciprocal Rank Fusion
(ES rrf retriever). Pinned against the DuckDB twin, plus the RRF
contracts: rank-only fusion (score scales don't matter), both sides
contribute, text-only == pure reciprocal of the BM25 ranking."""

from __future__ import annotations

import pytest

from miru_spark.plans.hybrid import hybrid_rrf, hybrid_rrf_oracle_sql

TERMS = ["join", "hash"]


@pytest.fixture(scope="module")
def embeddings(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(embeddings):
    return list(embeddings.filter("vec_id = 0").first().embedding)


def _run(reader, embeddings, qvec, **kw):
    rows = hybrid_rrf(reader, TERMS, embeddings, qvec, **kw).collect()
    return [(r.doc_id, r.score) for r in rows]


def _exp(duck, **kw):
    return [
        (int(d), float(s))
        for d, s in duck.execute(
            hybrid_rrf_oracle_sql(TERMS, **kw)
        ).fetchall()
    ]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(n_text=25, n_vec=25, k=25),
    dict(rrf_k=10, mode="conjunctive"),
    dict(exclude=["dup"]),
])
def test_matches_oracle(reader, duck, embeddings, qvec, kw):
    assert _run(reader, embeddings, qvec, **kw) == _exp(duck, **kw) != []


def test_both_sides_contribute(reader, duck, embeddings, qvec):
    """The fused top-k contains docs from each source ranking that the
    other ranking alone would not produce in that order."""
    from miru_spark.pipeline.similarity import cosine_topk_bruteforce
    from miru_spark.plans.search import search_topk

    fused = [d for d, _ in _run(reader, embeddings, qvec, k=50)]
    text = {d for d, _ in search_topk(
        reader, TERMS, mode="disjunctive", k=100
    )}
    vec = {r.vec_id for r in cosine_topk_bruteforce(
        embeddings, qvec, k=100
    ).collect()}
    assert any(d in text and d not in vec for d in fused)
    assert any(d in vec and d not in text for d in fused)
    # the vector query's own doc (vec_id 0, cosine 1.0) ranks at the top
    # of the vector side so it must appear in the fused head
    assert 0 in fused


def test_rank_only_fusion(reader, embeddings, qvec):
    """RRF depends on ranks, not scores: fusing with rrf_k=0 vs 60 changes
    weights but the doc at text rank 1 + vec rank 1 (if any overlap) can
    never be beaten by a doc ranked worse on both sides."""
    got = _run(reader, embeddings, qvec, k=10**6)
    ranks = {d: i + 1 for i, (d, _) in enumerate(got)}
    # dominance check: build both source rankings and assert no doc worse
    # on BOTH sides outranks a doc better on both
    from miru_spark.pipeline.similarity import cosine_topk_bruteforce
    from miru_spark.plans.search import search_topk

    rt = {d: i + 1 for i, (d, _) in enumerate(
        search_topk(reader, TERMS, mode="disjunctive", k=100)
    )}
    rv = {r.vec_id: i + 1 for i, r in enumerate(
        cosine_topk_bruteforce(embeddings, qvec, k=100).collect()
    )}
    for a in ranks:
        for b in ranks:
            if (a in rt and b in rt and rt[a] < rt[b]
                    and a in rv and b in rv and rv[a] < rv[b]):
                assert ranks[a] < ranks[b]


def test_validation(reader, embeddings, qvec):
    with pytest.raises(ValueError, match="positive"):
        hybrid_rrf(reader, TERMS, embeddings, qvec, k=0)
    with pytest.raises(ValueError, match="rrf_k"):
        hybrid_rrf(reader, TERMS, embeddings, qvec, rrf_k=-1)


# ---- A108 hybrid linear combination (ES linear retriever, minmax) -----------


def test_linear_matches_oracle(reader, duck, embeddings, qvec):
    from miru_spark.plans.hybrid import hybrid_linear, hybrid_linear_oracle_sql

    for kw in [dict(), dict(n_text=25, n_vec=25, k=25),
               dict(w_text=1.0, w_vec=0.0), dict(w_text=0.2, w_vec=0.8),
               dict(exclude=["dup"])]:
        got = [
            (r.doc_id, r.score)
            for r in hybrid_linear(
                reader, TERMS, embeddings, qvec, **kw
            ).collect()
        ]
        exp = [
            (int(d), float(s))
            for d, s in duck.execute(
                hybrid_linear_oracle_sql(TERMS, **kw)
            ).fetchall()
        ]
        assert got == exp != [], kw


def test_linear_semantics(reader, duck, embeddings, qvec):
    """Normalized scores live in [0, w_text + w_vec]; the top hit of a
    text-only weighting is the BM25 winner with score exactly w_text (its
    own window's max normalizes to 1); magnitudes matter — linear and RRF
    may order differently but both are dominated by the per-side winners."""
    from miru_spark.plans.hybrid import hybrid_linear
    from miru_spark.plans.search import search_topk

    rows = hybrid_linear(reader, TERMS, embeddings, qvec, k=200).collect()
    assert rows and all(0.0 <= r.score <= 0.7 + 0.3 + 1e-9 for r in rows)
    text_only = hybrid_linear(
        reader, TERMS, embeddings, qvec, w_text=1.0, w_vec=0.0, k=1
    ).collect()[0]
    bm25_top = search_topk(reader, TERMS, mode="disjunctive", k=1)[0][0]
    assert text_only.doc_id == bm25_top and abs(text_only.score - 1.0) < 1e-9
    from miru_spark.plans.hybrid import hybrid_linear as hl

    with pytest.raises(ValueError, match="weights"):
        hl(reader, TERMS, embeddings, qvec, w_text=0.0, w_vec=0.0)
    with pytest.raises(ValueError, match="positive"):
        hl(reader, TERMS, embeddings, qvec, k=0)
