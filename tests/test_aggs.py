"""A59 cardinality + A60 percentiles aggregations over the candidate set
(ES cardinality / percentiles)."""

from __future__ import annotations

import numpy as np
import pytest

from miru_spark.plans.relational import (
    cardinality_oracle_sql,
    percentiles_oracle_sql,
)
from miru_spark.plans.search import (
    search_cardinality,
    search_percentiles,
    search_topk,
)


def test_cardinality_exact_matches_oracle(reader, duck):
    got = search_cardinality(
        reader, ["the", "a"], "conjunctive", col="lang", exact=True
    ).collect()
    exp = duck.execute(
        cardinality_oracle_sql(["the", "a"], "conjunctive", col="lang")
    ).fetchone()[0]
    assert got[0]["cardinality"] == exp
    assert exp > 1  # non-vacuous


def test_cardinality_approx_within_rsd(reader):
    """The HLL++ sketch (the ES-equivalent scale path) must land within
    its error band of the exact answer — tiny cardinalities are exact."""
    exact = search_cardinality(
        reader, ["the"], "disjunctive", col="lang", exact=True
    ).collect()[0]["cardinality"]
    approx = search_cardinality(
        reader, ["the"], "disjunctive", col="lang", rsd=0.05
    ).collect()[0]["cardinality"]
    assert abs(approx - exact) <= max(1, 3 * 0.05 * exact)


def test_cardinality_composes_with_where(reader, duck):
    # docmap 'repo' is documents.source (corpus_from_documents decoration)
    got = search_cardinality(
        reader, ["the"], "disjunctive", col="repo", exact=True,
        where={"lang": "en"},
    ).collect()[0]["cardinality"]
    exp = duck.execute(
        "WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term "
        "FROM documents), "
        "cand AS (SELECT DISTINCT doc_id FROM tok WHERE term='the') "
        "SELECT count(DISTINCT source) FROM cand JOIN documents USING(doc_id) "
        "WHERE lang='en'"
    ).fetchone()[0]
    assert got == exp


def test_percentiles_match_oracle(reader, duck):
    got = sorted(
        (float(r["pct"]), float(r["value"]))
        for r in search_percentiles(reader, ["the", "a"], "conjunctive").collect()
    )
    exp = sorted(
        (float(p), float(v))
        for p, v in duck.execute(
            percentiles_oracle_sql(["the", "a"], "conjunctive")
        ).fetchall()
    )
    assert got == exp
    assert len(got) == 7


def test_percentiles_match_numpy(reader):
    """Independent check: numpy's linear interpolation on the candidate
    docs' doc_len equals the engine."""
    cand = {d for d, _ in search_topk(reader, ["the"], "disjunctive", k=10**9)}
    dm = {
        int(r["doc_id"]): int(r["doc_len"])
        for r in reader.docmap_df().select("doc_id", "doc_len").collect()
    }
    vals = np.array(sorted(dm[d] for d in cand), dtype=float)
    pcts = (0.25, 0.5, 0.95)
    want = [
        (p, round(float(np.percentile(vals, p * 100, method="linear")), 6))
        for p in pcts
    ]
    got = sorted(
        (float(r["pct"]), float(r["value"]))
        for r in search_percentiles(
            reader, ["the"], "disjunctive", percentiles=pcts
        ).collect()
    )
    assert got == want


def test_percentiles_validation(reader):
    with pytest.raises(ValueError):
        search_percentiles(reader, ["the"], percentiles=(0.0, 0.5))
    with pytest.raises(ValueError):
        search_percentiles(reader, ["the"], percentiles=())


# ---- A67 adjacency_matrix (ES): pairwise filter-intersection counts --------

FILTERS = {
    "joins": ["join", "hash"],
    "sorting": ["sort"],
    "common": ["the"],
}


def test_adjacency_matrix_matches_duck(reader, duck):
    from miru_spark.plans.relational import adjacency_matrix_oracle_sql
    from miru_spark.plans.search import search_adjacency_matrix

    got = sorted(
        (r["bucket"], int(r["n_docs"]))
        for r in search_adjacency_matrix(reader, FILTERS).collect()
    )
    exp = sorted(
        (b, int(n))
        for b, n in duck.execute(adjacency_matrix_oracle_sql(FILTERS)).fetchall()
    )
    assert got == exp
    buckets = dict(got)
    # diagonal present, intersections bounded by their sides
    assert buckets["joins"] > 0 and buckets["common"] > 0
    assert buckets.get("common&joins", 0) <= min(
        buckets["common"], buckets["joins"]
    )
    assert len(got) <= 6  # 3 filters -> at most 3 diag + 3 pairs


def test_adjacency_matrix_agrees_with_counts(reader):
    """Diagonal buckets must equal the forward conjunctive hit counts."""
    from miru_spark.plans.search import search_adjacency_matrix, search_topk

    got = {
        r["bucket"]: int(r["n_docs"])
        for r in search_adjacency_matrix(reader, FILTERS).collect()
    }
    for name, terms in FILTERS.items():
        want = len(search_topk(reader, terms, "conjunctive", k=10**9))
        assert got.get(name, 0) == want, name


def test_adjacency_matrix_validation(reader):
    from miru_spark.plans.search import search_adjacency_matrix

    with pytest.raises(ValueError):
        search_adjacency_matrix(reader, {})


# ---- A103 multi_terms (ES multi_terms: tuple-keyed terms agg) ---------------


def test_multi_terms_matches_duck(reader, duck):
    from miru_spark.plans.relational import multi_terms_oracle_sql
    from miru_spark.plans.search import search_multi_terms

    for terms, mode, size in [
        (["the", "a"], "conjunctive", 5),
        (["dup"], "disjunctive", 50),
    ]:
        got = [
            (r.lang, r.repo, r.n_docs)
            for r in search_multi_terms(
                reader, terms, mode=mode, fields=("lang", "repo"), size=size
            ).collect()
        ]
        exp = duck.execute(
            multi_terms_oracle_sql(terms, mode, ("lang", "repo"), size)
        ).fetchall()
        assert got == [tuple(r) for r in exp] and got


def test_multi_terms_is_global_tuple_competition(reader):
    """The top-size tuple buckets equal the bruteforce top-size of the FULL
    (lang, repo) count list under (count desc, tuple asc) — tuple buckets
    compete globally, not within a per-lang nesting; and the counts
    partition the candidate set when size covers every bucket."""
    from miru_spark.plans.search import search_multi_terms, search_topk

    full = [
        (r.lang, r.repo, r.n_docs)
        for r in search_multi_terms(
            reader, ["the", "a"], fields=("lang", "repo"), size=10**6
        ).collect()
    ]
    n_cand = len(search_topk(reader, ["the", "a"], mode="conjunctive",
                             k=10**9))
    assert sum(n for _, _, n in full) == n_cand
    ranked = sorted(full, key=lambda t: (-t[2], t[0], t[1]))
    top3 = [
        (r.lang, r.repo, r.n_docs)
        for r in search_multi_terms(
            reader, ["the", "a"], fields=("lang", "repo"), size=3
        ).collect()
    ]
    assert top3 == ranked[:3]


def test_multi_terms_validation(reader):
    from miru_spark.plans.search import search_multi_terms

    with pytest.raises(ValueError, match="fields"):
        search_multi_terms(reader, ["the"], fields=("lang",))
    with pytest.raises(ValueError, match="size"):
        search_multi_terms(reader, ["the"], size=0)


# ---- A106 filters agg (ES filters + other_bucket) ----------------------------


def test_filters_agg_matches_duck(reader, duck):
    from miru_spark.plans.relational import filters_agg_oracle_sql
    from miru_spark.plans.search import search_filters_agg

    filters = {"joins": ["join", "hash"], "windows": ["window"],
               "nothing": ["dup", "zzz_not_in_vocab"]}
    got = [
        (r.bucket, r.n_docs)
        for r in search_filters_agg(reader, filters).collect()
    ]
    exp = duck.execute(filters_agg_oracle_sql(filters)).fetchall()
    assert got == [tuple(r) for r in exp]
    by = dict(got)
    assert by["nothing"] == 0  # zero-count named bucket still emitted
    assert by["joins"] > 0 and by["_other_"] >= 0


def test_filters_agg_other_partitions_live_docs(reader, spark):
    """other + |union of matched docs| == live doc count: the other bucket
    completes a partition even though named buckets may overlap."""
    from miru_spark.plans.search import search_filters_agg, search_topk

    filters = {"a": ["join"], "b": ["join", "hash"]}  # b subset-of a docs
    rows = dict(
        (r.bucket, r.n_docs)
        for r in search_filters_agg(reader, filters).collect()
    )
    a_docs = {d for d, _ in search_topk(reader, ["join"], k=10**9)}
    b_docs = {d for d, _ in search_topk(reader, ["join", "hash"],
                                        mode="conjunctive", k=10**9)}
    assert rows["a"] == len(a_docs) and rows["b"] == len(b_docs)
    n_live = reader.docmap_df().count()
    assert rows["_other_"] == n_live - len(a_docs | b_docs)
    # overlapping buckets: sum of named counts EXCEEDS the union
    assert rows["a"] + rows["b"] > len(a_docs | b_docs)
    no_other = {
        r.bucket
        for r in search_filters_agg(reader, filters,
                                    other_bucket=False).collect()
    }
    assert no_other == {"a", "b"}


def test_filters_agg_validation(reader):
    from miru_spark.plans.search import search_filters_agg

    with pytest.raises(ValueError, match="at least one"):
        search_filters_agg(reader, {})
    with pytest.raises(ValueError, match="reserved"):
        search_filters_agg(reader, {"_other_": ["join"]})


# ---- A111 terms agg ordered by a sub-agg metric ------------------------------


def test_facets_by_metric_matches_duck(reader, duck):
    from miru_spark.plans.relational import facets_by_metric_oracle_sql
    from miru_spark.plans.search import search_facets_by_metric

    for metric in ("avg", "sum", "min", "max"):
        got = [
            (r.lang, r.n_docs, r.metric)
            for r in search_facets_by_metric(
                reader, ["the", "a"], metric=metric, size=3
            ).collect()
        ]
        exp = duck.execute(
            facets_by_metric_oracle_sql(["the", "a"], metric=metric, size=3)
        ).fetchall()
        assert got == [tuple(r) for r in exp] and got, metric


def test_facets_by_metric_differs_from_count_order(reader):
    """The metric ordering genuinely reorders vs count ordering somewhere
    (else the case is vacuous), counts agree with the plain facets agg,
    and validation rejects unknown metrics/sizes."""
    from miru_spark.plans.search import search_facets, search_facets_by_metric

    by_avg = [
        r.lang
        for r in search_facets_by_metric(
            reader, ["the"], mode="disjunctive", metric="avg", size=100
        ).collect()
    ]
    counts = {
        r.lang: r.n_docs
        for r in search_facets(reader, ["the"], mode="disjunctive").collect()
    }
    by_count = sorted(counts, key=lambda g: (-counts[g], g))
    assert set(by_avg) == set(by_count)
    assert by_avg != by_count  # ordering by the metric is non-vacuous
    got_counts = {
        r.lang: r.n_docs
        for r in search_facets_by_metric(
            reader, ["the"], mode="disjunctive", metric="avg", size=100
        ).collect()
    }
    assert got_counts == counts
    with pytest.raises(ValueError, match="metric"):
        search_facets_by_metric(reader, ["the"], metric="median")
    with pytest.raises(ValueError, match="size"):
        search_facets_by_metric(reader, ["the"], size=0)
