"""Range aggregation (ES range) + rare_terms aggregation (ES rare_terms)."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import range_agg_oracle_sql
from miru_spark.plans.search import search_facets_ranges
from miru_spark.plans.sigterms import rare_terms, rare_terms_oracle_sql

RANGES = [(None, 20), (20, 60), (40, 80), (80, None), (500, None)]


@pytest.fixture(scope="module")
def corpus(spark):
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    return read_corpus(spark, SF_DIR)


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join", "hash"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_range_agg_matches_oracle(reader, duck, terms, mode):
    got = sorted(
        tuple(r)
        for r in search_facets_ranges(reader, terms, RANGES, mode=mode).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(range_agg_oracle_sql(terms, RANGES, mode)).fetchall()
    )
    assert got == exp


def test_range_agg_contract(reader):
    """Every requested bucket emits exactly one row (empties included);
    open-both-sides covers the whole candidate set; overlapping buckets
    double-count independently (ES semantics, not a partition)."""
    rows = {
        r["bucket"]: r["n_docs"]
        for r in search_facets_ranges(
            reader, ["the"], [(None, None), (None, 40), (20, None), (10**6, None)]
        ).collect()
    }
    assert set(rows) == {"*-*", "*-40", "20-*", "1000000-*"}
    assert rows["1000000-*"] == 0
    assert rows["*-*"] > 0
    # overlap: the two half-open buckets together exceed the universe
    # whenever [20, 40) is non-empty
    assert rows["*-40"] + rows["20-*"] >= rows["*-*"]


def test_range_agg_validation(reader):
    with pytest.raises(ValueError):
        search_facets_ranges(reader, ["the"], [])
    with pytest.raises(ValueError):
        search_facets_ranges(reader, ["the"], [(50, 50)])
    with pytest.raises(ValueError):
        search_facets_ranges(reader, ["the"], [(60, 20)])


def test_rare_terms_matches_oracle(reader, duck, corpus):
    got = sorted(
        tuple(r)
        for r in rare_terms(
            reader, corpus, ["dup"], mode="conjunctive", max_doc_count=18
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            rare_terms_oracle_sql(["dup"], "conjunctive", 18)
        ).fetchall()
    )
    assert got == exp and got  # non-vacuous on the test corpus


def test_rare_terms_is_the_tail(reader, corpus):
    """Monotone in max_doc_count, complements the common head: the rare
    set at cutoff c is a subset of the set at c+1, and every returned
    count respects the cutoff."""
    lo = rare_terms(reader, corpus, ["dup"], max_doc_count=17).collect()
    hi = rare_terms(reader, corpus, ["dup"], max_doc_count=18).collect()
    assert {r["term"] for r in lo} <= {r["term"] for r in hi}
    assert all(r["n_docs"] <= 17 for r in lo)
    assert all(r["n_docs"] <= 18 for r in hi)
    # count-ascending, term-tiebreak order (ES rare-first order)
    keys = [(r["n_docs"], r["term"]) for r in hi]
    assert keys == sorted(keys)


def test_rare_terms_validation(reader, corpus):
    with pytest.raises(ValueError):
        rare_terms(reader, corpus, ["dup"], max_doc_count=0)


def test_sampled_facets_matches_oracle(reader, duck):
    from miru_spark.plans.relational import sampled_facets_oracle_sql
    from miru_spark.plans.search import search_facets_sampled

    got = sorted(
        tuple(r)
        for r in search_facets_sampled(
            reader, ["the", "a"], mode="conjunctive", facet_col="lang",
            probability=0.5,
        ).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            sampled_facets_oracle_sql(["the", "a"], "conjunctive",
                                      probability=0.5)
        ).fetchall()
    )
    assert got == exp and got


def test_sampled_facets_contract(reader):
    """Determinism (layout-free draw), sample ⊂ full facet counts, p=1
    degenerates to the unsampled facet counts, validation."""
    import pytest

    from miru_spark.plans.search import search_facets, search_facets_sampled

    a = search_facets_sampled(reader, ["the"], facet_col="lang",
                              probability=0.5).collect()
    b = search_facets_sampled(reader, ["the"], facet_col="lang",
                              probability=0.5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    full = {
        r["lang"]: r["n_docs"]
        for r in search_facets(reader, ["the"], facet_col="lang").collect()
    }
    for r in a:
        assert 0 < r["n_docs"] <= full[r["lang"]]
    total_sampled = sum(r["n_docs"] for r in a)
    assert total_sampled < sum(full.values())  # genuinely sampled
    whole = search_facets_sampled(reader, ["the"], facet_col="lang",
                                  probability=1.0).collect()
    assert {(r["lang"], r["n_docs"]) for r in whole} == set(full.items())
    with pytest.raises(ValueError):
        search_facets_sampled(reader, ["the"], probability=0.0)


def test_facets_ranges_returns_lazy_plan(reader):
    # The builder must not execute a Spark job at construction time
    # (ADVICE r03): the unpivot is a stack() projection, not a collect().
    df = search_facets_ranges(reader, ["the"], RANGES)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "LocalRelation" not in plan.split("\n")[0]
    # executing it still yields one row per requested bucket, in order
    assert [r["bucket"] for r in df.collect()] == [
        "*-20", "20-60", "40-80", "80-*", "500-*"
    ]
