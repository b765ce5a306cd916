"""A77 — asciifolding analyzer (pinned diacritic fold)."""

from __future__ import annotations

import pytest

from miru_spark.functions.tokenize import FOLD_DST, FOLD_SRC, tokenize_py, tokens_col


def test_fold_semantics_and_impl_identity(spark):
    text = "Café RÉSUMÉ  naïve Über žluťoučký"
    want = tokenize_py(text, "ascii")
    assert want[:4] == ["cafe", "resume", "naive", "uber"]
    row = spark.createDataFrame([(text,)], "content string")
    assert row.select(tokens_col("content", "ascii")).first()[0] == want
    # pinned-table sanity: src/dst aligned, all dst chars plain ASCII
    assert len(FOLD_SRC) == len(FOLD_DST)
    assert all(ord(c) < 128 for c in FOLD_DST)


def test_ascii_index_serves_plain_queries(spark, duck, tmp_path_factory):
    from pyspark.sql import functions as F

    from miru_spark.index.reader import IndexReader
    from miru_spark.index.writer import build_index
    from miru_spark.plans.index_suite import _ascii_tok_sql
    from miru_spark.plans.relational import bm25_oracle_sql
    from miru_spark.plans.search import search_topk
    from miru_spark.schema import read_corpus
    from tests.conftest import SF_DIR

    corpus = read_corpus(spark, SF_DIR).withColumn(
        "content",
        F.concat(
            F.col("content"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" Café Résumé"))
            .otherwise(F.lit("")),
        ),
    )
    p = str(tmp_path_factory.mktemp("asciiidx") / "idx")
    build_index(spark, corpus, p, num_partitions=4, tokenizer="ascii")
    reader = IndexReader(spark, p)
    got = [(d, round(s, 6)) for d, s in
           search_topk(reader, ["cafe", "resume"], mode="conjunctive", k=10)]
    exp = duck.execute(
        bm25_oracle_sql(["cafe", "resume"], "conjunctive",
                        tok_sql=_ascii_tok_sql())
    ).fetchall()
    assert got == [(int(d), float(s)) for d, s in exp] and got
    # unfolded query terms never exist in the folded index
    assert search_topk(reader, ["café"], mode="disjunctive", k=5) == []
