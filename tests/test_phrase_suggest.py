"""A75 — phrase suggester: fuzzy candidates + bigram-LM rerank."""

from __future__ import annotations

import math

import pytest

from miru_spark.pipeline.lm import train_bigram_lm
from miru_spark.plans.didyoumean import phrase_suggest_oracle_sql, suggest_phrase


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    p = str(tmp_path_factory.mktemp("dymidx") / "idx")
    build_index(spark, read_corpus(spark, SF_DIR), p, num_partitions=4)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bg, uni, v = train_bigram_lm(docs)
    return IndexReader(spark, p), bg, uni, v


@pytest.mark.parametrize(
    "q1,q2",
    [("joinn", "hashh"), ("the", "dta"), ("jon", "hash"), ("tha", "a")],
    ids=lambda x: str(x),
)
def test_phrase_suggest_matches_oracle(env, duck, q1, q2):
    reader, bg, uni, v = env
    got = suggest_phrase(reader, f"{q1} {q2}", bg, uni, v, top_n=3)
    want = [
        (s, float(sc))
        for s, sc in duck.execute(phrase_suggest_oracle_sql(q1, q2, top_n=3)).fetchall()
    ]
    assert got == want


def test_phrase_suggest_context_beats_per_token(env):
    """The point of LM reranking: the top phrase is a real high-frequency
    bigram, not just each token's independently most-popular correction."""
    reader, bg, uni, v = env
    top, _ = suggest_phrase(reader, "joinn hashh", bg, uni, v, top_n=1)[0]
    assert "join" in top.split() and "hash" in top.split()


def test_phrase_suggest_verbatim_fallback_and_validation(env):
    """Tokens with no dictionary neighbors stay verbatim (smoothed score),
    never dropped; empty query rejected."""
    reader, bg, uni, v = env
    res = suggest_phrase(reader, "zzqqxx the", bg, uni, v, top_n=1)
    assert res and res[0][0].startswith("zzqqxx ")
    assert res[0][1] < 0  # smoothed log-prob, finite
    assert math.isfinite(res[0][1])
    with pytest.raises(ValueError):
        suggest_phrase(reader, "", bg, uni, v)
    with pytest.raises(ValueError):
        suggest_phrase(reader, "the a", bg, uni, v, top_n=0)


def test_phrase_suggest_three_token_reference(env):
    """Independent recompute for a 3-token query: engine score equals the
    chain ln P(w1) + ln P(w2|w1) + ln P(w3|w2) built from raw counts."""
    reader, bg, uni, v = env
    got = suggest_phrase(reader, "the dta a", bg, uni, v, top_n=1)[0]
    toks = got[0].split()
    c1 = {r["w1"]: r["c1"] for r in uni.collect()}
    c12 = {(r["w1"], r["w2"]): r["c12"] for r in bg.collect()}
    tot = sum(c1.values())
    k = 0.5
    s = math.log((c1.get(toks[0], 0) + k) / (tot + k * v))
    for a, b in zip(toks, toks[1:]):
        s += math.log((c12.get((a, b), 0) + k) / (c1.get(a, 0) + k * v))
    assert abs(got[1] - round(s, 6)) < 1e-9


def test_phrase_suggest_beam_bounds_long_queries(env):
    """A 12-token query with multiple candidates per token completes
    instantly under the beam and returns a finite top suggestion (no
    max_candidates^n blowup)."""
    reader, bg, uni, v = env
    q = " ".join(["tha", "dta"] * 6)
    res = suggest_phrase(reader, q, bg, uni, v, top_n=1, beam=16)
    assert res and len(res[0][0].split()) == 12 and math.isfinite(res[0][1])
    with pytest.raises(ValueError):
        suggest_phrase(reader, q, bg, uni, v, beam=0)


def test_phrase_suggest_oracle_verbatim_fallback(env, duck):
    """A token with no dictionary neighbors: engine keeps it verbatim and
    the SQL twin now carries the same fallback row — both sides agree."""
    reader, bg, uni, v = env
    got = suggest_phrase(reader, "zzqqxx the", bg, uni, v, top_n=3)
    want = [
        (s, float(sc))
        for s, sc in duck.execute(
            phrase_suggest_oracle_sql("zzqqxx", "the", top_n=3)
        ).fetchall()
    ]
    assert got == want and got
