"""terms_set query (ES terms_set / Lucene CoveringQuery) — A85."""

from __future__ import annotations

import pytest

from miru_spark.plans.relational import terms_set_oracle_sql
from miru_spark.plans.search import search_distributed, search_terms_set

TERMS = ["join", "hash", "dup", "tree", "node"]


@pytest.mark.parametrize("divisor", [20, 30, 60])
def test_terms_set_matches_oracle(reader, duck, divisor):
    got = sorted(
        tuple(r)
        for r in search_terms_set(reader, TERMS, divisor=divisor, k=10).collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            terms_set_oracle_sql(TERMS, divisor=divisor, k=10)
        ).fetchall()
    )
    assert got == exp


def test_floor_is_per_doc_and_selective(reader):
    """The floor genuinely filters (subset of the unfloored disjunction),
    every survivor meets ITS OWN floor, and some doc is excluded by a floor
    another doc passes (per-doc-ness, not a global min_match)."""
    k = 1 << 30
    floored = search_terms_set(reader, TERMS, divisor=30, k=k).collect()
    base = search_distributed(
        reader, TERMS, mode="disjunctive", k=None, round_digits=None,
        with_nmatch=True,
    ).collect()
    nmatch = {r["doc_id"]: r["nmatch"] for r in base}
    dl = {
        r["doc_id"]: r["doc_len"]
        for r in reader.docmap_df().select("doc_id", "doc_len").collect()
    }
    fl = {d: min(len(TERMS), max(1, 1 + dl[d] // 30)) for d in nmatch}
    got = {r["doc_id"] for r in floored}
    want = {d for d in nmatch if nmatch[d] >= fl[d]}
    assert got == want
    assert got < set(nmatch)  # strictly filtered on this corpus
    # per-doc: there exist two docs with the same nmatch where one passes
    # and one fails (their floors differ)
    by_nmatch: dict[int, set[bool]] = {}
    for d, n in nmatch.items():
        by_nmatch.setdefault(n, set()).add(d in got)
    assert any(len(v) == 2 for v in by_nmatch.values())


def test_scores_unchanged_by_floor(reader):
    """A qualifying doc's score equals its plain disjunctive BM25 score."""
    flo = dict(
        (r["doc_id"], r["score"])
        for r in search_terms_set(reader, TERMS, divisor=30, k=1 << 30).collect()
    )
    base = dict(
        (r["doc_id"], r["score"])
        for r in search_distributed(
            reader, TERMS, mode="disjunctive", k=None
        ).collect()
    )
    assert flo and all(abs(base[d] - s) < 1e-9 for d, s in flo.items())


def test_terms_set_validation(reader):
    with pytest.raises(ValueError):
        search_terms_set(reader, [], divisor=30)
    with pytest.raises(ValueError):
        search_terms_set(reader, TERMS, divisor=0)
    with pytest.raises(ValueError):
        search_distributed(reader, TERMS, k=10, with_nmatch=True)
