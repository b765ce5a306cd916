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
