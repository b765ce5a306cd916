"""Fuzzy (Levenshtein) queries and faceted hit counts."""

from __future__ import annotations

import pytest

from miru_spark.index.reader import _lev_within
from miru_spark.plans.relational import bm25_fuzzy_oracle_sql, facet_oracle_sql
from miru_spark.plans.search import search, search_facets, search_fuzzy


def _vocab(duck):
    return [
        r[0]
        for r in duck.execute(
            "WITH tok AS (SELECT unnest(string_split(text,' ')) AS t FROM documents) "
            "SELECT DISTINCT t FROM tok WHERE t<>'' ORDER BY 1"
        ).fetchall()
    ]


def test_lev_within_agrees_with_duck(duck):
    vocab = _vocab(duck)
    for probe in ["ag", "hsh", "sort", "xyzzy", "ro", "the"]:
        for t in vocab:
            want = duck.execute(
                "SELECT levenshtein(?, ?) <= 1", [probe, t]
            ).fetchone()[0]
            assert _lev_within(probe, t, 1) == want, (probe, t)


@pytest.mark.parametrize("probe", ["ag", "hsh", "ro", "sort"])
def test_expand_fuzzy_matches_vocab(reader, duck, probe):
    want = sorted(t for t in _vocab(duck) if _lev_within(probe, t, 1))
    assert reader.expand_fuzzy(probe, max_edits=1) == want


def test_expand_fuzzy_multi_hit(reader):
    assert reader.expand_fuzzy("ag", max_edits=1) == ["a", "agg"]
    assert reader.expand_fuzzy("xyzzy") == []
    with pytest.raises(ValueError):
        reader.expand_fuzzy("")
    with pytest.raises(ValueError):
        reader.expand_fuzzy("ag", max_terms=1)


@pytest.mark.parametrize("probe", ["ag", "hsh", "lin"])
def test_fuzzy_search_matches_oracle(reader, duck, probe):
    got = [(d, round(s, 6)) for d, s in search_fuzzy(reader, probe, k=10)]
    want = [
        (d, s) for d, s in duck.execute(bm25_fuzzy_oracle_sql(probe)).fetchall()
    ]
    assert got == want


def test_fuzzy_via_wrapper(reader):
    assert search(reader, "hsh~", k=5) == search_fuzzy(reader, "hsh", k=5)
    assert search(reader, "dup OR hsh~", k=5) == search(reader, "dup OR hash", k=5)


@pytest.mark.parametrize(
    "terms,mode",
    [(["the", "a"], "conjunctive"), (["join", "dup"], "disjunctive")],
    ids=lambda x: str(x),
)
def test_facets_match_oracle(reader, duck, terms, mode):
    got = [
        (r.lang, r.n_docs)
        for r in search_facets(reader, terms, mode=mode, facet_col="lang").collect()
    ]
    want = [tuple(r) for r in duck.execute(facet_oracle_sql(terms, mode)).fetchall()]
    assert got == want


def test_facets_total_equals_candidates(reader):
    """Facet counts partition the candidate set: totals must agree."""
    from miru_spark.plans.search import search_distributed

    n = (
        search_distributed(reader, ["the", "dup"], mode="disjunctive", k=None)
        .count()
    )
    facets = search_facets(reader, ["the", "dup"], mode="disjunctive").collect()
    assert sum(r.n_docs for r in facets) == n


def test_facets_with_exclusion(reader, duck):
    got = {
        r.lang: r.n_docs
        for r in search_facets(
            reader, ["the"], mode="conjunctive", exclude=["dup"]
        ).collect()
    }
    base = {
        r.lang: r.n_docs
        for r in search_facets(reader, ["the"], mode="conjunctive").collect()
    }
    dup = {
        lang: n
        for lang, n in duck.execute(facet_oracle_sql(["dup"], "conjunctive")).fetchall()
    }
    # per-facet: base minus docs that also contain 'dup' and 'the'
    both = {
        lang: n
        for lang, n in duck.execute(
            facet_oracle_sql(["the", "dup"], "conjunctive")
        ).fetchall()
    }
    for lang, n in base.items():
        assert got.get(lang, 0) == n - both.get(lang, 0)
    assert dup  # sanity: the exclusion actually removed something somewhere


# ------------------------------------------------- deletion-neighborhood ---

@pytest.fixture(scope="module")
def fuzzy_reader(spark, tmp_path_factory):
    """A second index WITH the FastSS deletion-neighborhood dictionary."""
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_fuzzy_dictionary, build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("fzidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4)
    n = build_fuzzy_dictionary(spark, p)
    assert n > 0
    return IndexReader(spark, p)


def test_fuzzy_index_equals_scan(reader, fuzzy_reader, duck):
    """FastSS seeks return EXACTLY the banded-scan expansion for every
    vocabulary term and a batch of misspelling probes."""
    probes = _vocab(duck) + ["ag", "hsh", "ro", "lin", "xyzzy", "a", "z",
                             "srot", "jion", "thee", "qury"]
    for probe in probes:
        assert fuzzy_reader.expand_fuzzy(probe) == reader.expand_fuzzy(probe), probe


def test_fuzzy_index_is_used(fuzzy_reader, monkeypatch):
    """With the artifact present, expansion never touches the df dataset."""
    fuzzy_reader.expand_fuzzy("ag")  # warm the dataset handle
    monkeypatch.setattr(
        fuzzy_reader, "_df_dset",
        property(lambda self: (_ for _ in ()).throw(AssertionError())),
        raising=False,
    )
    assert fuzzy_reader.expand_fuzzy("ag") == ["a", "agg"]


def test_fuzzy_index_max_edits_2_falls_back(fuzzy_reader, reader):
    """Depth-1 neighborhoods only answer max_edits=1; 2 uses the scan."""
    got = fuzzy_reader.expand_fuzzy("hsh", max_edits=2, max_terms=4096)
    want = reader.expand_fuzzy("hsh", max_edits=2, max_terms=4096)
    assert got == want and "hash" in got


def test_facets_topk_matches_oracle(reader, duck):
    from miru_spark.plans.relational import facet_topk_oracle_sql
    from miru_spark.plans.search import search_facets_topk

    got = [
        tuple(r)
        for r in search_facets_topk(
            reader, ["the", "dup"], mode="disjunctive", facet_col="lang", k=3
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            facet_topk_oracle_sql(["the", "dup"], "disjunctive", "lang", k=3)
        ).fetchall()
    ]
    assert got == want
    # every facet contributes at most k rows, ranked 1..k
    by_facet = {}
    for lang, rk, _, _ in got:
        by_facet.setdefault(lang, []).append(rk)
    assert all(rks == list(range(1, len(rks) + 1)) for rks in by_facet.values())


# ---- A105 OSA transpositions (ES default fuzziness) -------------------------


def test_osa_within_agrees_with_duck_damerau(duck):
    """_lev_within(transpositions=True) at k=1 == DuckDB damerau_levenshtein
    <= 1 over every (probe, vocab) pair — OSA and full Damerau coincide at
    one edit, which is exactly why the engine pins the flag to max_edits=1."""
    vocab = _vocab(duck)
    for probe in ["jion", "osrt", "hsa", "ag", "the", "xyzzy", "atble"]:
        for t in vocab:
            want = duck.execute(
                "SELECT damerau_levenshtein(?, ?) <= 1", [probe, t]
            ).fetchone()[0]
            got = _lev_within(probe, t, 1, transpositions=True)
            assert got == want, (probe, t)


def test_expand_fuzzy_transpositions(reader, fuzzy_reader, duck):
    """'jion' reaches 'join' only with transpositions on; the FastSS
    dictionary path and the banded scan agree with the flag set (deletion
    neighborhoods already cover adjacent swaps at one edit)."""
    assert reader.expand_fuzzy("jion", max_edits=1) == []
    assert reader.expand_fuzzy("jion", max_edits=1, transpositions=True) == [
        "join"
    ]
    for probe in ["jion", "osrt", "hsa", "ag"]:
        want = sorted(
            t for t in _vocab(duck)
            if _lev_within(probe, t, 1, transpositions=True)
        )
        assert reader.expand_fuzzy(probe, transpositions=True) == want
        assert fuzzy_reader.expand_fuzzy(probe, transpositions=True) == want
    with pytest.raises(ValueError, match="transpositions"):
        reader.expand_fuzzy("jion", max_edits=2, transpositions=True)


def test_fuzzy_search_osa_matches_oracle(reader, duck):
    got = [
        (d, round(s, 6))
        for d, s in search_fuzzy(reader, "jion", k=10, transpositions=True)
    ]
    want = [
        (int(d), float(s))
        for d, s in duck.execute(
            bm25_fuzzy_oracle_sql("jion", max_edits=1, transpositions=True)
        ).fetchall()
    ]
    assert got == want and got
    # without the flag the same probe finds nothing (distance-2 everywhere)
    assert search_fuzzy(reader, "jion", k=10) == []
