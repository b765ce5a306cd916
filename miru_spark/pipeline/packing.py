"""Sequence packing — the concat-and-chunk layout step of LLM pretraining.

Training consumes fixed-length sequences of ``seq_len`` tokens; the standard
data layout (GPT-2/3, Pile, LLaMA recipes) concatenates all documents in a
deterministic order and splits the token stream at exact ``seq_len``
boundaries, letting documents span boundaries. The pipeline question per
document is therefore *where it lands*: which training sequence its first
token falls in, at what offset, and how many sequences it touches — that
placement map is what shuffling/sharding jobs and attrition audits join
against.

Placement is a pure function of the exclusive prefix sum of token counts in
document order. A naive Spark window over a global ``ORDER BY doc_id`` is
correct but collapses to ONE partition (the classic global-window scale
trap), so the prefix sum here is two-level:

* bucket   = ``doc_id // bucket_width`` — contiguous id ranges, so bucket
  order == document order (doc_ids are the engine's dense build-time ids);
* per-bucket token totals (one map-side-combined hash agg, ~n/width rows)
  get their own exclusive prefix sum over the tiny bucket table — the only
  single-partition window, over thousands of rows at trillion-doc scale
  when ``bucket_width`` is ~1e6;
* within each bucket the window partitions by bucket (parallel), and the
  document's global prefix = bucket offset + within-bucket prefix.

Token counts use the same whitespace definition as
:func:`miru_spark.pipeline.textqual.token_counts` (``\\S+`` runs), so the
packing budget agrees with the pipeline's token accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    bucket_width: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Placement map of concat-and-chunk packing at ``seq_len`` tokens.

    Returns (doc_id, n_tokens, seq_id, seq_off, n_seqs) where ``seq_id`` is
    the training sequence holding the document's first token, ``seq_off``
    the offset inside it, and ``n_seqs`` how many sequences the document
    spans (0 for an empty document, which occupies no stream positions).
    Deterministic and layout-free: depends only on (doc_id, token count).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    doc_id = F.col(id_col)
    n = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("long")
    # `div` is exact integer division; double-quotient-then-cast rounds
    # wrong once values pass 2^53 (real at trillion-token prefix sums)
    base = docs.select(
        doc_id.alias("doc_id"),
        n.alias("n_tokens"),
        F.expr(f"CAST(`{id_col}` AS BIGINT) div {int(bucket_width)}").alias("_bk"),
    )
    # exclusive prefix sum of token counts per id-range bucket (tiny table)
    bk_sums = base.groupBy("_bk").agg(F.sum("n_tokens").alias("_bk_n"))
    w_bk = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    bk_off = bk_sums.select(
        "_bk", F.coalesce(F.sum("_bk_n").over(w_bk), F.lit(0)).alias("_bk_off")
    )
    # within-bucket exclusive prefix sum — partitioned window, fully parallel
    w_in = (
        Window.partitionBy("_bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        base.join(F.broadcast(bk_off), "_bk")
        .withColumn(
            "_before",
            F.col("_bk_off") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
    )
    L = int(seq_len)
    return cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"_before div {L}").alias("seq_id"),
        (F.col("_before") % F.lit(L)).alias("seq_off"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"(_before + n_tokens - 1) div {L}")
            - F.expr(f"_before div {L}")
            + 1
        )
        .alias("n_seqs"),
    ).orderBy("doc_id")


def pack_sequences_oracle_sql(seq_len: int) -> str:
    """DuckDB twin: a single exclusive-prefix-sum window (fine at oracle
    scale; the Spark side replaces it with the two-level sum above)."""
    return rf"""
WITH n AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS bef
  FROM n)
SELECT doc_id, n_tokens,
       bef // {seq_len} AS seq_id,
       bef % {seq_len} AS seq_off,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE (bef + n_tokens - 1) // {seq_len} - bef // {seq_len} + 1
       END AS n_seqs
FROM c ORDER BY doc_id
""".strip()
