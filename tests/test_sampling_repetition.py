"""Deterministic sampling + Gopher-style repetition filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from miru_spark.pipeline.sampling import (
    hash_sample,
    hash_sample_oracle_sql,
    stratified_sample,
    stratified_sample_oracle_sql,
)
from miru_spark.pipeline.textqual import repetition_oracle_sql, repetition_stats
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_matches_oracle(spark, duck, docs):
    got = sorted(r.doc_id for r in hash_sample(docs, 0.25).select("doc_id").collect())
    want = [r[0] for r in duck.execute(hash_sample_oracle_sql(0.25)).fetchall()]
    assert got == want
    # rate sanity on 500 docs: binomial(500, .25) stays well inside [75, 175]
    assert 75 <= len(got) <= 175


def test_hash_sample_layout_independent(docs):
    a = {r.doc_id for r in hash_sample(docs.repartition(2), 0.25).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(16), 0.25).collect()}
    assert a == b


def test_hash_sample_monotone_in_rate(docs):
    """A doc kept at rate r stays kept at every r' > r (nested samples)."""
    small = {r.doc_id for r in hash_sample(docs, 0.1).collect()}
    big = {r.doc_id for r in hash_sample(docs, 0.5).collect()}
    assert small <= big
    assert {r.doc_id for r in hash_sample(docs, 0.0).collect()} == set()
    assert len(hash_sample(docs, 1.0).collect()) == docs.count()


def test_hash_sample_bad_rate(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample_matches_oracle(duck, docs):
    got = [
        (r.source, r.doc_id)
        for r in stratified_sample(docs, 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
        .collect()
    ]
    want = [tuple(r) for r in duck.execute(stratified_sample_oracle_sql(5)).fetchall()]
    assert got == want


def test_stratified_sample_quota(docs):
    out = stratified_sample(docs, 3).groupBy("source").count().collect()
    assert out and all(r["count"] <= 3 for r in out)
    # every stratum with >= 3 docs fills its quota exactly
    sizes = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    for r in out:
        assert r["count"] == min(3, sizes[r.source])


def test_repetition_matches_oracle(duck, docs):
    got = [tuple(r) for r in repetition_stats(docs).collect()]
    want = [tuple(r) for r in duck.execute(repetition_oracle_sql()).fetchall()]
    assert got == want


def test_repetition_flags_degenerate_doc(spark):
    rows = [
        Row(doc_id=0, text="spam spam spam spam spam spam spam spam spam spam"),
        Row(doc_id=1, text="the quick brown fox jumps over a lazy sleeping dog"),
        Row(doc_id=2, text="x"),  # shorter than any n-gram window
    ]
    out = {r.doc_id: r for r in repetition_stats(spark.createDataFrame(rows)).collect()}
    assert not out[0].keep and out[0].dup_token_ratio == 0.9
    assert out[0].top_2gram_ratio == 1.0 and out[0].dup_5gram_ratio == 1.0
    assert out[1].keep and out[1].top_2gram_ratio < 0.2
    assert out[2].keep and out[2].top_2gram_ratio == 0.0


# ---- domain-mixture resampling (Pile/DoReMi-style reweighting) ---------------


def test_mixture_sample_matches_oracle(duck, docs):
    from miru_spark.pipeline.sampling import (
        mixture_sample,
        mixture_sample_oracle_sql,
    )

    for weights in [{"en": 0.5, "zh": 0.3, "fr": 0.2},
                    {"en": 0.1, "de": 0.9},
                    {"es": 1.0}]:
        got = sorted(
            (r.lang, r.doc_id)
            for r in mixture_sample(docs, weights).select(
                "lang", "doc_id"
            ).collect()
        )
        want = [tuple(r) for r in duck.execute(
            mixture_sample_oracle_sql(weights)
        ).fetchall()]
        assert got == want and got, weights


def test_mixture_sample_semantics(docs):
    """The scarcest-relative-to-target domain keeps rate exactly 1.0 (no
    doc of it is dropped); unlisted domains are dropped entirely; the kept
    mixture tracks the target within binomial noise; rates reject bad
    weights."""
    from miru_spark.pipeline.sampling import mixture_rates, mixture_sample

    counts = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    weights = {"en": 0.5, "zh": 0.3, "fr": 0.2}
    rates = mixture_rates({d: counts[d] for d in weights}, weights)
    anchor = min(weights, key=lambda d: counts[d] / weights[d])
    assert rates[anchor] == 1.0 and all(0 < r <= 1.0 for r in rates.values())
    kept = mixture_sample(docs, weights).groupBy("lang").count().collect()
    kept_counts = {r.lang: r["count"] for r in kept}
    assert set(kept_counts) <= set(weights)  # unlisted langs dropped
    assert kept_counts[anchor] == counts[anchor]  # rate-1.0 domain intact
    total = sum(kept_counts.values())
    for d, w in weights.items():
        expect = w * total
        assert abs(kept_counts.get(d, 0) - expect) <= 4 * (expect ** 0.5) + 4, (
            d, kept_counts, expect,
        )
    with pytest.raises(ValueError, match="positive"):
        mixture_rates({"en": 10}, {"en": 0.0})
    with pytest.raises(ValueError, match="absent"):
        mixture_rates({"en": 10}, {"en": 0.5, "xx": 0.5})


def test_threshold_hex_sqlround_matches_duck(duck):
    """The Python hex-threshold arithmetic behind mixture_sample equals
    DuckDB's printf/floor expression for a spread of rates including the
    rounding-sensitive neighborhoods — the cross-engine bit-identity the
    oracle relies on."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from miru_spark.pipeline.sampling import _threshold_hex_sqlround

    @settings(max_examples=200, deadline=None)
    @given(st.floats(min_value=0.0, max_value=0.999999999,
                     allow_nan=False, allow_infinity=False))
    def check(rate):
        py = _threshold_hex_sqlround(rate)
        sql = duck.execute(
            "SELECT printf('%08x', CAST(floor(? * 4294967296.0 + 0.5) "
            "AS BIGINT))", [rate],
        ).fetchone()[0]
        assert py == sql, rate

    check()
    assert _threshold_hex_sqlround(1.0) == "g"
    # the knife-edge: a rate within one ulp of an integer threshold
    edge = 12345678 / 4294967296.0
    assert _threshold_hex_sqlround(edge) == format(
        int(math.floor(edge * 4294967296.0 + 0.5)), "08x"
    )
