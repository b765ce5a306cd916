"""The flagship end-to-end query used by ``entry()``.

Builds the inverted index on the given corpus and serves one block-max WAND
BM25 search, returning (doc_id, repo, path, commit, score). Until the binary
index path lands (SURVEY.md M2-M5), falls back to the relational twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.plans.relational import bm25_search_relational
from miru_spark.schema import read_corpus

FLAGSHIP_TERMS = ["join", "hash"]


def flagship_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = read_corpus(spark, sf_dir)
    topk = bm25_search_relational(corpus, FLAGSHIP_TERMS, mode="conjunctive", k=10)
    docmeta = corpus.select("doc_id", "repo", "path", "commit")
    return (
        F.broadcast(topk)
        .join(docmeta, "doc_id")
        .select("doc_id", "repo", "path", "commit", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
