"""Code-mode tokenization end-to-end: the north_star's actual input is
source code ('tokenize code content'); identifiers like snake_case stay
whole, operators/punctuation split, everything lowercases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.functions.tokenize import doc_len_col, tokenize_code_udf, tokens_col
from miru_spark.index.reader import IndexReader
from miru_spark.index.writer import build_index
from miru_spark.plans.search import search_topk

CODE_DOCS = [
    (0, "r1", "a.py", "v0", "py", "def my_func(x):\n    return x + OFFSET_42\n"),
    (1, "r1", "b.py", "v0", "py", "class FooBar:\n    my_func = None  # TODO\n"),
    (2, "r2", "c.rs", "v0", "rs", "fn main() { let my_func = |x| x * 2; }\n"),
    (3, "r2", "d.go", "v0", "go", "func Main() error { return nil }\n"),
]


@pytest.fixture(scope="module")
def code_reader(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        CODE_DOCS,
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    p = str(tmp_path_factory.mktemp("code") / "idx")
    build_index(spark, corpus, p, num_partitions=2, tokenizer="code")
    return IndexReader(spark, p)


def test_code_tokens_builtin(spark):
    df = spark.createDataFrame(
        [("def my_func(x): return FooBar.my_func",)], "content string"
    )
    toks = df.select(tokens_col("content", "code").alias("t")).collect()[0].t
    assert toks == ["def", "my_func", "x", "return", "foobar", "my_func"]
    # doc_len_col must agree exactly with size(tokens_col)
    dl = df.select(doc_len_col("content", "code").alias("n")).collect()[0].n
    assert dl == len(toks)
    # and the pandas-UDF alternative path must agree token for token
    udf_toks = df.select(tokenize_code_udf(F.col("content")).alias("t")).collect()[0].t
    assert udf_toks == toks


def test_identifier_search(code_reader):
    hits = search_topk(code_reader, ["my_func"], mode="conjunctive", k=10)
    assert [d for d, _ in hits] == [0, 2, 1] or set(d for d, _ in hits) == {0, 1, 2}


def test_case_folding_and_operators_split(code_reader):
    assert [d for d, _ in search_topk(code_reader, ["foobar"], "conjunctive")] == [1]
    # 'main' matches both the rust fn and the Go Func Main (lowercased)
    assert {d for d, _ in search_topk(code_reader, ["main"], "conjunctive")} == {2, 3}
    # numbers inside identifiers are kept: OFFSET_42 -> offset_42
    assert [d for d, _ in search_topk(code_reader, ["offset_42"], "conjunctive")] == [0]


def test_conjunctive_code_query(code_reader):
    assert [d for d, _ in search_topk(code_reader, ["def", "return"], "conjunctive")] == [0]
