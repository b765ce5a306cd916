"""HTML text extraction (pipeline/extract.py) — the C4/CCNet first step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.pipeline.extract import (
    extracted_text_col,
    strip_html,
    strip_html_sql,
)

CASES = [
    # (raw, expected)
    ("<p>a</p><p>b</p>", "a b"),  # tags are word boundaries, never glue
    ("<script>if (a<b) {x}</script>text", "text"),  # raw '<' inside code
    ("<style a=b>p{}</style>x", "x"),
    ("<!-- c --><b>bold</b>", "bold"),
    ("&amp;amp; &lt;tag&gt;", "&amp; <tag>"),  # double-escape order
    ("a&nbsp;b", "a b"),
    ('<a href="u" data-x=\'y\'>link</a>', "link"),
    ("no markup at all", "no markup at all"),
    ("  <p>  spaced\t\tout  </p>  ", "spaced out"),
    ("<SCRIPT>upper</SCRIPT>tail", "tail"),  # case-insensitive blocks
]


def test_extraction_cases_and_cross_engine(spark, duck):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "text string")
    got = [r.c for r in df.select(extracted_text_col("text").alias("c")).collect()]
    assert got == [want for _, want in CASES]
    sql = "SELECT " + strip_html_sql("?::VARCHAR")
    for raw, want in CASES:
        assert duck.execute(sql, [raw]).fetchone()[0] == want, raw


def test_strip_html_over_corpus_matches_duck(spark, duck):
    from tests.conftest import SF_DIR

    pre, post = "<html><body><p>", "</p><script>j<k</script>&amp;x</body></html>"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.concat(F.lit(pre), "text", F.lit(post)).alias("text")
    )
    got = sorted(
        (r.doc_id, r.clean_text)
        for r in strip_html(docs).select("doc_id", "clean_text").collect()
    )
    inner = strip_html_sql(f"'{pre}' || text || '{post}'")
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT doc_id, {inner} FROM documents"
        ).fetchall()
    )
    assert got == want and got
    # plumbing: narrow map, no shuffle in the plan
    plan = strip_html(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan
