"""ES analytics aggregations over the candidate set: string_stats,
median_absolute_deviation (exact), boxplot (exact), t_test (Welch,
pinned to t_stat + welch_df)."""

from __future__ import annotations

import math

import numpy as np

from miru_spark.plans.relational import (
    boxplot_oracle_sql,
    mad_oracle_sql,
    string_stats_oracle_sql,
    t_test_oracle_sql,
)
from miru_spark.plans.search import (
    search_boxplot,
    search_mad,
    search_string_stats,
    search_t_test,
    search_topk,
)

TERMS = ["the", "a"]


def _cand_lens(reader, terms, mode="conjunctive"):
    cand = {d for d, _ in search_topk(reader, terms, mode, k=10**9)}
    dm = {
        int(r["doc_id"]): int(r["doc_len"])
        for r in reader.docmap_df().select("doc_id", "doc_len").collect()
    }
    return np.array(sorted(dm[d] for d in cand), dtype=float)


def test_string_stats_matches_oracle(reader, duck):
    got = search_string_stats(reader, TERMS, "conjunctive", col="lang").collect()
    exp = duck.execute(
        string_stats_oracle_sql(TERMS, "conjunctive", "lang")
    ).fetchall()
    assert len(got) == len(exp) == 1
    g, e = got[0], exp[0]
    assert (g["n_vals"], g["min_len"], g["max_len"]) == (e[0], e[1], e[2])
    assert g["avg_len"] == e[3]
    assert g["entropy"] == e[4]
    assert g["n_vals"] > 0 and g["entropy"] > 0  # non-vacuous


def test_string_stats_entropy_first_principles(reader):
    """-sum(p log2 p) over the character distribution of the candidates'
    lang values, recomputed independently in Python."""
    cand = {d for d, _ in search_topk(reader, TERMS, "conjunctive", k=10**9)}
    langs = {
        int(r["doc_id"]): r["lang"]
        for r in reader.docmap_df().select("doc_id", "lang").collect()
    }
    vals = [langs[d] for d in cand]
    counts: dict[str, int] = {}
    for v in vals:
        for ch in v:
            counts[ch] = counts.get(ch, 0) + 1
    total = sum(counts.values())
    ent = -sum(c / total * math.log2(c / total) for c in counts.values())
    row = search_string_stats(reader, TERMS, "conjunctive", col="lang").collect()[0]
    assert abs(row["entropy"] - ent) < 1e-6
    assert row["n_vals"] == len(vals)
    assert row["min_len"] == min(len(v) for v in vals)
    assert row["max_len"] == max(len(v) for v in vals)
    assert abs(row["avg_len"] - sum(len(v) for v in vals) / len(vals)) < 1e-6


def test_mad_matches_oracle(reader, duck):
    got = search_mad(reader, TERMS, "conjunctive").collect()[0]
    exp = duck.execute(mad_oracle_sql(TERMS, "conjunctive")).fetchone()
    assert (got["n_docs"], got["median_v"], got["mad"]) == exp
    assert got["mad"] >= 0


def test_mad_first_principles(reader):
    xs = _cand_lens(reader, TERMS)
    med = float(np.median(xs))
    mad = float(np.median(np.abs(xs - med)))
    got = search_mad(reader, TERMS, "conjunctive").collect()[0]
    assert abs(got["median_v"] - med) < 1e-6
    assert abs(got["mad"] - mad) < 1e-6
    assert got["n_docs"] == len(xs)


def test_boxplot_matches_oracle(reader, duck):
    got = search_boxplot(reader, TERMS, "conjunctive").collect()[0]
    exp = duck.execute(boxplot_oracle_sql(TERMS, "conjunctive")).fetchone()
    assert tuple(got) == exp


def test_boxplot_first_principles(reader):
    xs = _cand_lens(reader, TERMS)
    got = search_boxplot(reader, TERMS, "conjunctive").collect()[0]
    # Spark's percentile interpolates at rank p*(n-1) == numpy 'linear'
    q1, q2, q3 = (float(np.quantile(xs, p)) for p in (0.25, 0.5, 0.75))
    assert got["min_v"] == int(xs.min()) and got["max_v"] == int(xs.max())
    assert abs(got["q1"] - q1) < 1e-6
    assert abs(got["q2"] - q2) < 1e-6
    assert abs(got["q3"] - q3) < 1e-6
    assert abs(got["iqr"] - (q3 - q1)) < 1e-6
    # quartiles are ordered and bracketed by min/max
    assert got["min_v"] <= got["q1"] <= got["q2"] <= got["q3"] <= got["max_v"]


def test_t_test_matches_oracle(reader, duck):
    got = search_t_test(reader, TERMS, ["dup"], "conjunctive").collect()[0]
    exp = duck.execute(t_test_oracle_sql(TERMS, ["dup"], "conjunctive")).fetchone()
    assert tuple(got) == exp


def test_t_test_first_principles(reader):
    a, b = _cand_lens(reader, TERMS), _cand_lens(reader, ["dup"])
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    got = search_t_test(reader, TERMS, ["dup"], "conjunctive").collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["t_stat"] - t) < 1e-5
    assert abs(got["welch_df"] - dof) < 1e-4


def test_t_test_identical_groups_is_zero(reader):
    got = search_t_test(reader, TERMS, TERMS, "conjunctive").collect()[0]
    assert got["t_stat"] == 0.0
    assert got["n_a"] == got["n_b"]
