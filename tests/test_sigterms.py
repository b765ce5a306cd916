"""A55 — significant_terms aggregation (ES significant_terms, JLH
heuristic): terms overrepresented in the candidate set vs the corpus.
Pinned value-for-value against the DuckDB twin plus the JLH contracts."""

from __future__ import annotations

import pytest

from miru_spark.plans.sigterms import (
    significant_terms,
    significant_terms_oracle_sql,
)

TERMS = ["join", "hash"]


@pytest.fixture(scope="module")
def corpus(spark):
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    return read_corpus(spark, SF_DIR)


def _run(reader, corpus, **kw):
    rows = significant_terms(reader, corpus, TERMS, **kw).collect()
    return [(r.term, r.fg_count, r.bg_count, r.score) for r in rows]


def _exp(duck, **kw):
    return [
        (t, int(f), int(b), float(s))
        for t, f, b, s in duck.execute(
            significant_terms_oracle_sql(TERMS, **kw)
        ).fetchall()
    ]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(mode="conjunctive", top_n=20, min_doc_count=1),
    dict(exclude=["dup"]),
])
def test_matches_oracle(reader, corpus, duck, kw):
    assert _run(reader, corpus, **kw) == _exp(duck, **kw) != []


def test_query_terms_excluded_and_scores_positive(reader, corpus):
    got = _run(reader, corpus)
    names = [t for t, _, _, _ in got]
    assert not set(names) & set(TERMS)
    # top results are genuinely overrepresented: fg_rate > bg_rate
    assert all(s > 0 for _, _, _, s in got[:3])


def test_jlh_monotone_in_lift(reader, corpus):
    """Among returned terms with equal bg_count, higher fg_count must
    never score lower (JLH is monotone in fg_rate for fixed bg_rate)."""
    got = _run(reader, corpus, top_n=100, min_doc_count=1)
    by_bg: dict = {}
    for t, f, b, s in got:
        by_bg.setdefault(b, []).append((f, s))
    for pairs in by_bg.values():
        pairs.sort()
        for (f1, s1), (f2, s2) in zip(pairs, pairs[1:]):
            if f1 < f2:
                assert s1 <= s2


def test_validation(reader, corpus):
    with pytest.raises(ValueError, match="top_n"):
        significant_terms(reader, corpus, TERMS, top_n=0)
    with pytest.raises(ValueError, match="min_doc_count"):
        significant_terms(reader, corpus, TERMS, min_doc_count=0)
