"""Field collapsing (A50 — ES collapse + inner_hits / Lucene grouping):
at most per_group hits per docmap-field value, groups ranked by their best
hit. Checked structurally against the flat ranking and value-for-value
against the DuckDB window-SQL oracle."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import collapse_oracle_sql
from miru_spark.plans.search import search_collapse, search_topk

TERMS = ["join", "hash", "dup"]


@pytest.fixture(scope="module")
def collapsed(spark, reader):
    rows = search_collapse(
        reader, TERMS, mode="disjunctive", collapse_field="repo",
        k_groups=4, per_group=2,
    ).collect()
    return [(r.grp, r.grk, r.rk, r.doc_id, r.score) for r in rows]


def test_collapse_shape(collapsed):
    grks = sorted({g for _, g, _, _, _ in collapsed})
    assert grks == list(range(1, len(grks) + 1)) and len(grks) <= 4
    by_group: dict = {}
    for grp, grk, rk, d, s in collapsed:
        by_group.setdefault((grp, grk), []).append((rk, d, s))
    for (_grp, _), hits in by_group.items():
        rks = [r for r, _, _ in hits]
        assert rks == list(range(1, len(rks) + 1)) and len(rks) <= 2
        scores = [s for _, _, s in hits]
        assert scores == sorted(scores, reverse=True)


def test_collapse_agrees_with_flat_ranking(reader, collapsed):
    """Group heads are exactly the first occurrence of each repo in the
    flat ranking, in the same order."""
    flat = search_topk(reader, TERMS, mode="disjunctive", k=10**9)
    repo_of = {
        r.doc_id: r.repo
        for r in reader.docmap_df().select("doc_id", "repo").collect()
    }
    seen, first_per_repo = set(), []
    for d, s in flat:
        rp = repo_of[d]
        if rp not in seen:
            seen.add(rp)
            first_per_repo.append((rp, d, round(s, 6)))
    heads = [(grp, d, s) for grp, _, rk, d, s in collapsed if rk == 1]
    assert heads == first_per_repo[: len(heads)]


def test_collapse_matches_duckdb_oracle(collapsed, duck):
    exp = duck.execute(
        collapse_oracle_sql(TERMS, "disjunctive", grp_expr="source",
                            k_groups=4, per_group=2)
    ).fetchall()
    got = [(g, int(grk), int(rk), int(d), float(s))
           for g, grk, rk, d, s in collapsed]
    assert got == [(g, int(grk), int(rk), int(d), float(s))
                   for g, grk, rk, d, s in exp]


def test_collapse_per_group_one_is_distinct_repos(reader):
    one = search_collapse(
        reader, TERMS, mode="disjunctive", collapse_field="repo",
        k_groups=10**6, per_group=1,
    ).collect()
    grps = [r.grp for r in one]
    assert len(grps) == len(set(grps))


def test_collapse_validation_and_filters(reader):
    with pytest.raises(ValueError, match="positive"):
        search_collapse(reader, TERMS, k_groups=0)
    # metadata filter composes: every surviving hit satisfies it
    lang_en = {
        r.doc_id
        for r in reader.docmap_df().filter("lang = 'en'")
        .select("doc_id").collect()
    }
    rows = search_collapse(
        reader, TERMS, mode="disjunctive", collapse_field="repo",
        k_groups=3, per_group=2, where={"lang": "en"},
    ).collect()
    assert rows and all(r.doc_id in lang_en for r in rows)
