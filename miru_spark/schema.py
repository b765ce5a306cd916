"""Canonical corpus schema + adapters from the sandbox ``documents`` table.

The engine's canonical input is the source-code corpus shape pinned by
BASELINE.json's input_hint:

    (repo:string, path:string, commit:string, lang:string, content:string)

The sandbox stand-in is the driver-generated ``documents`` parquet
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64 —
FIXTURES.md). ``corpus_from_documents`` maps it deterministically
(SURVEY.md section 1.1): repo<-source, path<-'doc_%05d.txt', commit<-'v0',
content<-text, and carries the pre-assigned ``doc_id`` through (SURVEY.md
section 1.3: when the input already has a doc_id, use it — this is what makes
results independent of partitioning/parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

# docmap: one row per indexed document (SURVEY.md section 1.2)
DOCMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
)


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """documents from JSONL (optionally .gz — Spark decompresses by
    extension), the standard LLM-training-data interchange format. The
    schema is EXPLICIT: schema inference would scan the data once just to
    guess types (and guess doc_id as string for large ids), and at 100-TB
    scale that pre-pass is a full extra read. Columns may appear in any
    order; extra JSON keys are ignored."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """documents from headered CSV (optionally .gz). Explicit schema for
    the same reasons as JSONL; header consumed for column order only.
    Multiline/quoted text fields are handled by Spark's CSV parser."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def corpus_from_any(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """One corpus entry point across source formats — downstream (index
    build, pipeline ops) is format-blind, and the format-identity test
    proves rank-identical serving from parquet, JSONL, and CSV sources."""
    readers = {
        "parquet": lambda: spark.read.schema(DOCUMENTS_SCHEMA).parquet(path),
        "jsonl": lambda: read_documents_jsonl(spark, path),
        "csv": lambda: read_documents_csv(spark, path),
    }
    if fmt not in readers:
        raise ValueError(f"unknown corpus format {fmt!r} (know {sorted(readers)})")
    return corpus_from_documents(readers[fmt]())


def corpus_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> canonical corpus + doc_id."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        F.format_string("doc_%05d.txt", F.col("doc_id")).alias("path"),
        F.lit("v0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def read_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_from_documents(read_documents(spark, sf_dir))


def _dense_rank_ids(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """THE distributed dense-rank: doc_id = 0-based rank of ``key_cols``.
    Range-partitioned sort + per-partition counts + cumulative base
    offsets joined back — deterministic at any parallelism, no
    single-task global window. Shared by :func:`assign_doc_ids` (rank by
    identity) and :func:`reassign_ids_sorted` (rank by sort field)."""
    keyed = (
        df.repartitionByRange(*[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = Window.partitionBy("_pid").orderBy(*key_cols)
    counts = keyed.groupBy("_pid").count()
    base = counts.withColumn(
        "_base",
        F.coalesce(
            F.sum("count").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_base")
    return (
        keyed.withColumn("_local", F.row_number().over(local).cast("long"))
        .join(F.broadcast(base), "_pid")
        .withColumn("doc_id", F.col("_base") + F.col("_local") - F.lit(1))
        .drop("_pid", "_local", "_base")
    )


def reassign_ids_sorted(corpus: DataFrame, sort_col) -> DataFrame:
    """Index sorting (Lucene ``IndexWriterConfig.setIndexSort``): rewrite
    doc_ids as the dense 0-based rank of ``(sort_key, old doc_id)``, so
    ascending doc_id order IS the sort order — queries sorted by the index
    sort field can then EARLY-TERMINATE after the first k matches
    (plans.search.search_sorted_topk) instead of scoring every candidate."""
    keyed = corpus.withColumn("_sk", sort_col).withColumnRenamed(
        "doc_id", "_old"
    )
    return _dense_rank_ids(keyed, ["_sk", "_old"]).drop("_sk", "_old")


def assign_doc_ids(corpus: DataFrame) -> DataFrame:
    """Assign deterministic, order-independent doc_ids where the input has none.

    doc_id = dense 0-based rank of (repo, path, commit) — content-derived, so
    results are independent of input partitioning/parallelism, which the
    two-cluster-size determinism requirement silently demands (SURVEY.md
    section 1.3).

    Scale shape: a RANGE-partitioned sort (repartitionByRange + per-partition
    sort), then a per-partition row count + cumulative base offset joined
    back — every stage is distributed; no single-task global window. (Round 1
    used ``row_number() over (order by ...)`` with no partition key, which
    Catalyst executes as one task holding the whole corpus.)
    """
    if "doc_id" in corpus.columns:
        return corpus
    return _dense_rank_ids(corpus, ["repo", "path", "commit"])
