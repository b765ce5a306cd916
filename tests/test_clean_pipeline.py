"""End-to-end cleaning pipeline: stage attribution, dedup keep-min, oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from miru_spark.pipeline.clean import clean_corpus, clean_oracle_sql


PARAMS = dict(
    allowed_langs=("en", "es"), min_quality=0.55, min_tokens=15,
    max_top2gram=0.07, max_dup_token=0.68, sample_rate=0.8,
)


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_clean_matches_oracle(spark, docs, duck):
    got = sorted(
        (int(r.doc_id), r.stage)
        for r in clean_corpus(docs.select("doc_id", "text"), **PARAMS).collect()
    )
    want = sorted(
        (int(d), s) for d, s in duck.execute(clean_oracle_sql(**PARAMS)).fetchall()
    )
    assert got == want
    stages = Counter(s for _, s in got)
    # the ledger covers every input doc exactly once
    assert sum(stages.values()) == docs.count()


def test_clean_stage_order_and_dedup_keepmin(spark):
    """First-failing-stage attribution + keep-min dedup among survivors:
    a doc failing lang AND quality reports 'lang'; the smallest surviving
    doc_id of an exact-text group is kept, its twins die at 'dedup'; a dup
    whose twin was removed upstream is NOT a duplicate."""
    long_en = "the code and the data in the file with the test " * 3
    rows = [
        (1, long_en),            # kept (en, long, clean)
        (2, long_en),            # exact twin of 1 -> dedup loser
        (3, "der und die das " * 8),   # lang kill (also low quality -> 'lang' wins)
        (4, "the a " * 4),       # quality kill (8 tokens < min_tokens)
        (5, "the a " * 4),       # twin of 4, but 4 died upstream -> also 'quality', NOT dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dict(
        (int(r.doc_id), r.stage)
        for r in clean_corpus(
            df, allowed_langs=("en",), min_quality=0.2, min_tokens=15,
            max_dup_token=1.0, max_top2gram=1.0, max_dup5gram=1.0,
            sample_rate=1.0,
        ).collect()
    )
    assert got[1] == "kept"
    assert got[2] == "dedup"
    assert got[3] == "lang"
    assert got[4] == "quality" and got[5] == "quality"


def test_clean_sample_stage_is_deterministic(spark, docs):
    """The sample stage is a pure function of (seed, doc_id): two runs under
    different partitioning agree row-for-row."""
    a = clean_corpus(docs.select("doc_id", "text"), **PARAMS).collect()
    b = clean_corpus(
        docs.select("doc_id", "text").repartition(13), **PARAMS
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_clean_rate_one_keeps_sample_stage_empty(spark, docs):
    res = clean_corpus(
        docs.select("doc_id", "text"),
        allowed_langs=("en", "es", "de", "unknown"),
        min_quality=0.0, min_tokens=0, sample_rate=1.0,
    ).collect()
    stages = Counter(r.stage for r in res)
    assert stages.get("sample", 0) == 0 and stages.get("lang", 0) == 0
    assert stages["kept"] == len(res)  # no dups in the raw corpus
