"""Bigram-LM perplexity scoring (the CCNet quality signal)."""

from __future__ import annotations

import math

import pytest

from miru_spark.pipeline.lm import perplexity, perplexity_oracle_sql, train_bigram_lm


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_perplexity_matches_oracle(spark, docs, duck):
    bg, uni, v = train_bigram_lm(docs)
    got = sorted(
        (int(r[0]), int(r[1]), r[2], r[3])
        for r in perplexity(docs, bg, uni, v).collect()
    )
    want = sorted(
        (int(r[0]), int(r[1]), float(r[2]), float(r[3]))
        for r in duck.execute(perplexity_oracle_sql()).fetchall()
    )
    assert got == want and len(got) == docs.count()


def test_perplexity_handcrafted(spark):
    """Independent recompute on a 2-doc corpus: doc 1's 'a b' bigram is
    the whole model's mass for w1='a', doc 2's unseen pair costs the
    smoothed floor."""
    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bg, uni, v = train_bigram_lm(df)
    assert v == 3  # {a, b, c}
    res = {r.doc_id: r for r in perplexity(df, bg, uni, v, k=0.5).collect()}
    # doc 1 bigrams: (a,b)x2, (b,a)x1; c(a)=3, c(b)=2 (unigrams over corpus)
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (2 + 0.5 * 3)
    nll1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert res[1].n_bigrams == 3
    assert abs(res[1].avg_nll - round(nll1, 6)) < 1e-9
    assert abs(res[1].ppl - round(math.exp(nll1), 6)) < 1e-9
    # doc 2: single bigram (a,c) with c=1
    p_ac = (1 + 0.5) / (3 + 0.5 * 3)
    assert abs(res[2].avg_nll - round(-math.log(p_ac), 6)) < 1e-9


def test_perplexity_orders_garble_above_reference(spark):
    """The quality-signal property: a doc of in-distribution text scores
    LOWER perplexity under the corpus model than a doc of rare
    transitions."""
    rows = [(i, "the data in the file has the data " * 3) for i in range(8)]
    rows += [(100, "file has the data the data in the"),   # in-distribution
             (101, "data file in has the the data the")]   # scrambled
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bg, uni, v = train_bigram_lm(df)
    res = {r.doc_id: r.ppl for r in perplexity(df, bg, uni, v).collect()}
    assert res[100] < res[101]


def test_perplexity_short_docs_absent_and_validation(spark):
    df = spark.createDataFrame([(1, "one"), (2, "two tokens")],
                               "doc_id long, text string")
    bg, uni, v = train_bigram_lm(df)
    out = perplexity(df, bg, uni, v).collect()
    assert [r.doc_id for r in out] == [2]  # 1-token doc has no bigrams
    with pytest.raises(ValueError):
        perplexity(df, bg, uni, v, k=0.0)


# ---- CCNet head/middle/tail bucketing ----------------------------------------


def test_ccnet_buckets_match_duck(spark, duck, docs):
    from miru_spark.pipeline.lm import (
        ccnet_buckets,
        ccnet_buckets_oracle_sql,
        train_bigram_lm,
    )

    bg, uni, v = train_bigram_lm(docs)
    got = sorted(
        (r.doc_id, r.lang, r.ppl, r.ppl_bucket)
        for r in ccnet_buckets(docs, bg, uni, v).collect()
    )
    want = sorted(
        tuple(r) for r in duck.execute(ccnet_buckets_oracle_sql()).fetchall()
    )
    assert got == want and got


def test_ccnet_buckets_are_per_lang_ppl_terciles(spark, docs):
    """Within every language: bucket sizes differ by at most one with
    head >= middle >= tail (NTILE fill), and max(ppl in head) <=
    min(ppl in middle) <= ... under the (ppl, doc_id) tie order —
    i.e. the split really is the per-language perplexity ranking, not a
    global cut."""
    from miru_spark.pipeline.lm import ccnet_buckets, train_bigram_lm

    bg, uni, v = train_bigram_lm(docs)
    rows = ccnet_buckets(docs, bg, uni, v).collect()
    by_lang: dict[str, dict[str, list]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.ppl_bucket, []).append(
            (r.ppl, r.doc_id)
        )
    assert len(by_lang) > 1
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        sizes = [len(buckets[b]) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1 and sizes == sorted(
            sizes, reverse=True
        ), (lang, sizes)
        assert max(buckets["head"]) <= min(buckets["middle"]), lang
        assert max(buckets["middle"]) <= min(buckets["tail"]), lang
