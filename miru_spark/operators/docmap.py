"""A2 — document normalization: doc_id, content_sha256, doc_len.

All JVM built-ins (whole-stage codegen): ``sha2`` for the per-row invariant
pinned by BASELINE.json's input_hint ("content sha256 equality"), token count
via the shared tokenizer column. No Python worker in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.functions.tokenize import tokens_col
from miru_spark.schema import assign_doc_ids


def normalize_corpus(corpus: DataFrame, tokenizer: str = "whitespace") -> DataFrame:
    """corpus(+doc_id?) -> (doc_id, repo, path, commit, lang, content,
    content_sha256, tokens, doc_len)."""
    out = assign_doc_ids(corpus)
    toks = tokens_col("content", tokenizer)
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256)).withColumn(
        "tokens", toks
    ).withColumn("doc_len", F.size("tokens").cast("long"))


def docmap_of(normalized: DataFrame) -> DataFrame:
    return normalized.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha256", "doc_len"
    )
