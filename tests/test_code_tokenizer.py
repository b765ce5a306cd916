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


# ---------------------------------------------------- code_split (A44) ----

SPLIT_SAMPLES = [
    "parseHTTPResponse2",
    "snake_case_id XMLHttpRequest",
    "camelCase mixedUP a1b2 V8Engine",
    "def My_Func(): return FooBar2.getHTTPStatus()",
    "ALLCAPS lower 42 x86_64",
]


def _py_split(text: str) -> list[str]:
    import re

    for pat in [
        r"([A-Z]+)([A-Z][a-z])",
        r"([a-z0-9])([A-Z])",
        r"([A-Za-z])([0-9])",
        r"([0-9])([A-Za-z])",
    ]:
        text = re.sub(pat, r"\1 \2", text)
    return [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]


def test_code_split_semantics():
    from miru_spark.functions.tokenize import tokenize_py

    assert tokenize_py("parseHTTPResponse2", "code_split") == [
        "parse", "http", "response", "2",
    ]
    assert tokenize_py("snake_case_id", "code_split") == ["snake", "case", "id"]
    assert tokenize_py("XMLHttpRequest", "code_split") == ["xml", "http", "request"]
    assert tokenize_py("x86_64", "code_split") == ["x", "86", "64"]


@pytest.mark.parametrize("text", SPLIT_SAMPLES)
def test_code_split_three_impls_agree(spark, text):
    from miru_spark.functions.tokenize import (
        tokenize_code_split_udf,
        tokenize_py,
    )

    df = spark.createDataFrame([(text,)], "content string")
    builtin = df.select(tokens_col("content", "code_split").alias("t")).collect()[0].t
    udf = df.select(tokenize_code_split_udf(F.col("content")).alias("t")).collect()[0].t
    py = tokenize_py(text, "code_split")
    assert builtin == udf == py == _py_split(text)
    dl = df.select(doc_len_col("content", "code_split").alias("n")).collect()[0].n
    assert dl == len(builtin)


def test_code_split_matches_duckdb_twin(spark, duck):
    """The driver-oracle tokenization (DuckDB regexp_replace chain) must
    produce IDENTICAL token streams to the Spark builtins on arbitrary
    content — this is what makes a code_split oracle valid."""
    rows = duck.execute(
        """
        WITH s(content) AS (VALUES
          ('parseHTTPResponse2 and V8Engine'),
          ('def My_Func(): return FooBar2.getHTTPStatus()'),
          ('x86_64 ALLCAPSlower')),
        t AS (SELECT content, string_split_regex(lower(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(content,
            '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
            '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
            '([A-Za-z])([0-9])', '\\1 \\2', 'g'),
            '([0-9])([A-Za-z])', '\\1 \\2', 'g')
          ), '[^a-z0-9]+') AS toks FROM s)
        SELECT content, list_filter(toks, x -> x <> '') FROM t ORDER BY content
        """
    ).fetchall()
    for content, duck_toks in rows:
        df = spark.createDataFrame([(content,)], "content string")
        spark_toks = (
            df.select(tokens_col("content", "code_split").alias("t"))
            .collect()[0].t
        )
        assert spark_toks == duck_toks, content


def test_code_split_index_serves_subtoken_queries(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        [
            (0, "r", "a.py", "v", "py", "resp = parseHTTPResponse2(x)"),
            (1, "r", "b.py", "v", "py", "http_response = fetch()"),
            (2, "r", "c.py", "v", "py", "class HttpResponseFactory: pass"),
            (3, "r", "d.py", "v", "py", "nothing relevant here"),
        ],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    p = str(tmp_path_factory.mktemp("codesplit") / "idx")
    build_index(spark, corpus, p, num_partitions=2, tokenizer="code_split")
    r = IndexReader(spark, p)
    # 'response' reaches camelCase, snake_case AND PascalCase variants
    hits = search_topk(r, ["response"], mode="conjunctive", k=10)
    assert sorted(d for d, _ in hits) == [0, 1, 2]
    hits = search_topk(r, ["http", "response"], mode="conjunctive", k=10)
    assert sorted(d for d, _ in hits) == [0, 1, 2]
