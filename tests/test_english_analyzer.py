"""A62 — the english analysis chain (Lucene EnglishAnalyzer shape):
lowercase -> default stop set -> EnglishMinimalStemFilter (plural 's')."""

from __future__ import annotations

import pytest

from miru_spark.functions.tokenize import (
    ENGLISH_STOPWORDS,
    tokenize_english_udf,
    tokenize_py,
    tokens_col,
)

SF_DIR = "/root/testdata/sf0.001"


def test_semantics():
    got = tokenize_py("The Dogs and trees pass US class bus atlas s", "english")
    #        stopword--^        ^--stopword
    assert got == ["dog", "tree", "pass", "us", "class", "bus", "atla", "s"]


def test_min_length_guard():
    assert tokenize_py("its bus loss", "english") == ["its", "bus", "loss"]
    assert tokenize_py("joins", "english") == ["join"]
    assert tokenize_py("THE A AND", "english") == []


def test_three_impls_agree(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    from pyspark.sql import functions as F

    a = docs.select("doc_id", tokens_col("text", "english").alias("t"))
    b = docs.select("doc_id", tokenize_english_udf("text").alias("t"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # driver-side twin on a sample
    rows = docs.limit(20).collect()
    got = a.filter(
        F.col("doc_id").isin([int(r["doc_id"]) for r in rows])
    ).collect()
    by_id = {int(r["doc_id"]): list(r["t"]) for r in got}
    for r in rows:
        assert by_id[int(r["doc_id"])] == tokenize_py(r["text"], "english")


@pytest.fixture(scope="module")
def en_reader(spark, tmp_path_factory):
    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.schema import read_corpus

    p = str(tmp_path_factory.mktemp("en_idx") / "idx")
    build_index(
        spark, read_corpus(spark, SF_DIR), p, num_partitions=4,
        tokenizer="english",
    )
    return IndexReader(spark, p)


def test_stopwords_absent_from_vocab(en_reader):
    assert en_reader.fetch_terms(["the", "a", "and"]) == {}
    assert en_reader.fetch_terms(["data"])  # real term survives


def test_end_to_end_matches_duck(en_reader, duck):
    from miru_spark.plans.relational import bm25_oracle_sql
    from miru_spark.plans.search import search_topk

    stops = ",".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    tok_sql = (
        "SELECT doc_id, CASE WHEN len(t) >= 4 AND t LIKE '%s' "
        "AND t NOT LIKE '%us' AND t NOT LIKE '%ss' "
        "THEN substr(t, 1, len(t) - 1) ELSE t END AS term FROM ("
        r"SELECT doc_id, lower(unnest(string_split_regex(text, '\s+'))) AS t "
        "FROM documents) "
        f"WHERE t <> '' AND t NOT IN ({stops})"
    )
    got = [
        (int(d), round(float(s), 6))
        for d, s in search_topk(
            en_reader, ["data", "join"], mode="conjunctive", k=10
        )
    ]
    exp = duck.execute(
        bm25_oracle_sql(["data", "join"], "conjunctive", tok_sql=tok_sql)
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp]
    assert got


def test_differs_from_whitespace_mode(en_reader, reader):
    """Dropping 'a'/'the' changes doc_len and avgdl, so english-mode BM25
    values must differ from whitespace-mode values for the same query."""
    from miru_spark.plans.search import search_topk

    en = search_topk(en_reader, ["data", "join"], "conjunctive", k=5)
    ws = search_topk(reader, ["data", "join"], "conjunctive", k=5)
    assert en and ws
    assert dict(en) != dict(ws)
