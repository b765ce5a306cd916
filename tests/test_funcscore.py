"""A52 — function_score (ES function_score / Lucene FunctionScoreQuery):
BM25 modified by metadata functions. Pinned value-for-value against the
DuckDB twin for every kernel / score_mode / boost_mode combination used,
plus the ES parameterization invariants (value 1 at origin, exactly
``decay`` at distance ``scale``)."""

from __future__ import annotations

import math

import pytest

from miru_spark.plans.funcscore import (
    Decay,
    FieldValueFactor,
    function_score_oracle_sql,
    search_function_score,
)

TERMS = ["join", "hash"]
GAUSS = Decay("gauss", "doc_len", origin=50.0, scale=20.0)
FVF = FieldValueFactor("doc_len", factor=0.1, modifier="log1p", weight=2.0)


def _run(reader, functions, **kw):
    rows = search_function_score(reader, TERMS, functions, **kw).collect()
    return [(r.doc_id, r.score) for r in rows]


def _exp(duck, functions, **kw):
    return [
        (int(d), float(s))
        for d, s in duck.execute(
            function_score_oracle_sql(TERMS, functions, **kw)
        ).fetchall()
    ]


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_kernels_match_oracle(reader, duck, kind):
    fns = [Decay(kind, "doc_len", origin=50.0, scale=20.0, offset=5.0,
                 decay=0.33)]
    assert _run(reader, fns) == _exp(duck, fns) != []


def test_fvf_sum_boost_matches_oracle(reader, duck):
    got = _run(reader, [FVF], boost_mode="sum")
    assert got == _exp(duck, [FVF], boost_mode="sum") != []


@pytest.mark.parametrize("score_mode", ["multiply", "sum", "max"])
def test_multi_function_combine_matches_oracle(reader, duck, score_mode):
    fns = [GAUSS, FVF]
    got = _run(reader, fns, score_mode=score_mode)
    assert got == _exp(duck, fns, score_mode=score_mode) != []


def test_replace_boost_mode(reader, duck):
    """boost_mode=replace: ranking is purely the function value, but the
    candidate set is still the query's (docs without the terms absent)."""
    got = _run(reader, [GAUSS], boost_mode="replace", mode="conjunctive")
    assert got == _exp(duck, [GAUSS], boost_mode="replace",
                       mode="conjunctive") != []


def test_decay_parameterization():
    """ES contract: value 1 inside offset, exactly `decay` at `scale`."""
    for kind in ("gauss", "exp", "linear"):
        d = Decay(kind, "x", origin=10.0, scale=5.0, offset=1.0, decay=0.4)
        sql = d.sql()
        import duckdb

        con = duckdb.connect()
        at = lambda x: con.execute(
            f"SELECT {sql} FROM (SELECT {x!r}::DOUBLE AS x)"
        ).fetchone()[0]
        assert at(10.0) == pytest.approx(1.0)
        assert at(10.9) == pytest.approx(1.0)  # inside offset
        assert at(16.0) == pytest.approx(0.4)  # origin + offset + scale
        assert at(4.0) == pytest.approx(0.4)   # symmetric


def test_exclude_composes(reader, duck):
    got = _run(reader, [GAUSS], exclude=["dup"])
    exp = _exp(duck, [GAUSS], exclude=["dup"])
    assert got == exp != []
    # NOT genuinely prunes: the full excluded candidate set is a strict
    # subset of the unexcluded one (dup co-occurs with the terms somewhere)
    full = {d for d, _ in _run(reader, [GAUSS], k=10**6)}
    kept = {d for d, _ in _run(reader, [GAUSS], exclude=["dup"], k=10**6)}
    assert kept < full


def test_validation(reader):
    with pytest.raises(ValueError, match="at least one"):
        search_function_score(reader, TERMS, [])
    with pytest.raises(ValueError, match="modifier"):
        FieldValueFactor("doc_len", modifier="square")
    with pytest.raises(ValueError, match="decay"):
        Decay("gauss", "doc_len", origin=0, scale=1, decay=1.0)
    with pytest.raises(ValueError, match="scale"):
        Decay("exp", "doc_len", origin=0, scale=0.0)
    with pytest.raises(ValueError, match="score_mode"):
        search_function_score(reader, TERMS, [GAUSS], score_mode="avg2")
    with pytest.raises(ValueError, match="boost_mode"):
        search_function_score(reader, TERMS, [GAUSS], boost_mode="min")


def test_whole_stage_codegen_plan(reader):
    """The modifier is a projection inside codegen — no Python eval node
    appears after the docmap join (the scoring scan itself is mapInArrow)."""
    df = search_function_score(reader, TERMS, [GAUSS, FVF])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- A110 random_score (deterministic md5-seeded jitter) ---------------------


def test_random_score_matches_oracle(reader, duck):
    from miru_spark.plans.funcscore import (
        FieldValueFactor,
        RandomScore,
        function_score_oracle_sql,
        search_function_score,
    )

    fns = [RandomScore(seed="ab1", weight=3.0),
           FieldValueFactor("doc_len", factor=0.1, modifier="sqrt")]
    got = [
        (r.doc_id, r.score)
        for r in search_function_score(
            reader, ["the", "a"], fns, mode="disjunctive",
            score_mode="sum", boost_mode="sum",
        ).collect()
    ]
    exp = duck.execute(
        function_score_oracle_sql(
            ["the", "a"], fns, mode="disjunctive",
            score_mode="sum", boost_mode="sum",
        )
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp] and got


def test_random_score_properties(reader):
    """Deterministic across calls, uniform-ish in [0,1) scaled by weight,
    different seeds reorder, invalid seed rejected."""
    from miru_spark.plans.funcscore import RandomScore, search_function_score

    def run(seed):
        return [
            (r.doc_id, r.score)
            for r in search_function_score(
                reader, ["the"], [RandomScore(seed=seed)],
                mode="disjunctive", score_mode="sum", boost_mode="replace",
                k=1000,
            ).collect()
        ]

    a1, a2, b = run("ab1"), run("ab1"), run("zz9")
    assert a1 == a2  # deterministic
    assert a1 != b  # seed changes the draw
    vals = [s for _, s in a1]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) > len(vals) * 0.9  # essentially no collisions
    import pytest as _pt

    with _pt.raises(ValueError, match="seed"):
        RandomScore(seed="bad seed!")
