"""Term range queries (TermRangeQuery) + matrix_stats aggregation."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import (
    bm25_term_range_oracle_sql,
    matrix_stats_oracle_sql,
)
from miru_spark.plans.search import search_matrix_stats, search_term_range


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("tridx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4)
    return IndexReader(spark, p)


@pytest.mark.parametrize(
    "lo,hi,il,ih",
    [("d", "f", True, True), ("join", "merge", True, False),
     ("a", "b", False, True), ("x", "z", True, True)],
    ids=lambda x: str(x),
)
def test_term_range_matches_oracle(reader, duck, lo, hi, il, ih):
    got = [(d, round(s, 6))
           for d, s in search_term_range(reader, lo, hi, il, ih, k=10)]
    exp = duck.execute(bm25_term_range_oracle_sql(lo, hi, il, ih, k=10)).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]


def test_term_range_expansion_and_bounds(reader):
    """Expansion equals the vocabulary slice; bound toggles drop exactly
    the endpoint terms; validation."""
    full = reader.expand_term_range("data", "join")
    assert full and full == sorted(full)
    assert all("data" <= t <= "join" for t in full)
    assert "data" not in reader.expand_term_range("data", "join", include_lo=False)
    assert "join" not in reader.expand_term_range("data", "join", include_hi=False)
    with pytest.raises(ValueError):
        reader.expand_term_range("z", "a")
    with pytest.raises(ValueError):
        reader.expand_term_range("a", "zz", max_terms=2)


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_matrix_stats_matches_oracle(reader, duck, terms, mode):
    got = [tuple(r) for r in search_matrix_stats(reader, terms, mode=mode).collect()]
    want = [tuple(r) for r in duck.execute(matrix_stats_oracle_sql(terms, mode)).fetchall()]
    assert got == want


def test_matrix_stats_numpy_identity(reader):
    """Independent numpy recompute (sample moments) of the same stats."""
    import numpy as np

    from miru_spark.plans.search import search_distributed

    cand = {r.doc_id for r in search_distributed(
        reader, ["the", "a"], mode="conjunctive", k=None, round_digits=None
    ).select("doc_id").collect()}
    dm = {r.doc_id: r.doc_len for r in reader.docmap_df().collect()}
    x = np.array([dm[d] for d in sorted(cand)], dtype=np.float64)
    y = np.array(sorted(cand), dtype=np.float64)
    row = search_matrix_stats(reader, ["the", "a"], mode="conjunctive").first()
    assert row["n_docs"] == len(cand)
    assert abs(row["var_x"] - np.var(x, ddof=1)) < 1e-5
    assert abs(row["covariance"] - np.cov(x, y, ddof=1)[0, 1]) < 1e-5
    assert abs(row["correlation"] - np.corrcoef(x, y)[0, 1]) < 1e-5


def test_matrix_stats_single_doc_yields_nulls(reader, duck):
    """n=1 candidate set: no sample variance exists — both engines return
    NULL for var/covar/corr (never a divide-by-zero or inf/NaN mismatch)."""
    terms = ["join", "hash", "dup", "sort", "merge"]  # conj -> few/one doc
    got = search_matrix_stats(reader, terms, mode="conjunctive").first()
    want = duck.execute(matrix_stats_oracle_sql(terms, "conjunctive")).fetchone()
    assert tuple(got) == tuple(want)
    if got["n_docs"] == 1:
        assert got["var_x"] is None and got["correlation"] is None


# ---- extended_stats (ES extended_stats: + sum_sq / variance / std_dev) -----


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join", "dup"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_extended_stats_matches_oracle(reader, duck, terms, mode):
    from miru_spark.plans.relational import extended_stats_oracle_sql
    from miru_spark.plans.search import search_extended_stats

    got = [tuple(r) for r in search_extended_stats(reader, terms, mode=mode).collect()]
    want = [tuple(r) for r in duck.execute(
        extended_stats_oracle_sql(terms, mode)
    ).fetchall()]
    assert got == want


def test_extended_stats_consistent_with_stats(reader):
    """The shared columns must agree with A46's stats row, and the derived
    moments must satisfy their defining identities."""
    import math

    from miru_spark.plans.search import search_extended_stats, search_field_stats

    ext = search_extended_stats(reader, ["the", "a"], mode="conjunctive").collect()[0]
    base = search_field_stats(reader, ["the", "a"], mode="conjunctive").collect()[0]
    assert (ext["n_docs"], ext["min_v"], ext["max_v"], ext["sum_v"], ext["avg_v"]) == (
        base["n_docs"], base["min_v"], base["max_v"], base["sum_v"], base["avg_v"]
    )
    mean = ext["sum_v"] / ext["n_docs"]
    var = ext["sum_sq"] / ext["n_docs"] - mean * mean
    assert abs(ext["variance"] - round(var, 6)) < 1e-9
    assert abs(ext["std_dev"] - round(math.sqrt(var), 6)) < 1e-9
    assert ext["variance"] >= 0


# ---- percentile_ranks (ES percentile_ranks: inverse percentiles) -----------


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join", "dup"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_percentile_ranks_matches_oracle(reader, duck, terms, mode):
    from miru_spark.plans.relational import percentile_ranks_oracle_sql
    from miru_spark.plans.search import search_percentile_ranks

    vals = (5.0, 30.0, 55.0, 500.0)
    got = sorted(
        tuple(r)
        for r in search_percentile_ranks(reader, terms, vals, mode=mode).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            percentile_ranks_oracle_sql(terms, list(vals), mode)
        ).fetchall()
    )
    assert got == want


def test_percentiles_invert_percentile_ranks(reader):
    """percentiles(pct_rank(v)/100) == v for any v PRESENT in the data —
    the exact inversion direction that survives tied (integer) values:
    pct_rank maps v to the upper edge of its tie run, and the rank-p*(n-1)
    percentile at that edge returns v itself. (The other direction,
    pct_rank(percentiles(p)) == 100p, holds only for continuous data —
    ties collapse interior ranks to the tie run's edge.)"""
    from miru_spark.plans.search import search_percentile_ranks, search_percentiles

    from miru_spark.plans.search import search

    cand = {d for d, _ in search(reader, "the", k=10**9)}
    lens = sorted(
        r.doc_len
        for r in reader.docmap_df().select("doc_id", "doc_len").collect()
        if r.doc_id in cand
    )
    probes = tuple(
        float(v)
        for v in dict.fromkeys(
            [lens[len(lens) // 10], lens[len(lens) // 2], lens[-1]]
        )
    )
    ranks = {
        r.value: r.pct_rank
        for r in search_percentile_ranks(reader, ["the"], probes,
                                         mode="disjunctive").collect()
    }
    pcts = tuple(ranks[v] / 100.0 for v in probes)
    back = {
        r.pct: r.value
        for r in search_percentiles(reader, ["the"], mode="disjunctive",
                                    percentiles=pcts).collect()
    }
    for v in probes:
        assert back[ranks[v] / 100.0] == v, (v, ranks[v])


def test_percentile_ranks_edges_and_validation(reader):
    from miru_spark.plans.search import search_percentile_ranks

    rows = {
        r.value: r.pct_rank
        for r in search_percentile_ranks(
            reader, ["the", "a"], (0.0, 10**9)
        ).collect()
    }
    assert rows[0.0] == 0.0 and rows[float(10**9)] == 100.0
    with pytest.raises(ValueError):
        search_percentile_ranks(reader, ["the", "a"], ())
