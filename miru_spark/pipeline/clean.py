"""End-to-end corpus cleaning pipeline (the Dolma / CCNet / Gopher recipe
shape): language filter -> quality thresholds -> repetition filter -> exact
dedup (keep-min among survivors) -> deterministic hash sample, with every
document attributed to the FIRST stage that removed it.

One composable operator instead of five ad-hoc scripts: the per-stage
operators (`lang_id`, `text_quality`, `repetition_stats`, the dedup window,
the md5 sample predicate) are the ones this package already ships, joined
on doc_id — at 100-TB scale each feature pass is one shuffle-free or
map-side-combined scan and the joins co-key on doc_id, so adding a stage is
O(one more column), not O(one more corpus copy). The output is
(doc_id, stage) — the removal ledger every production cleaning run keeps so
"why did my corpus shrink 40%?" is a GROUP BY, not a re-run.

Stage semantics (order is the recipe's, cheap-and-local before global):
  lang        pred_lang not in ``allowed_langs``
  quality     quality_score < ``min_quality`` or n_tokens outside
              [``min_tokens``, ``max_tokens``]
  repetition  any Gopher ratio above its cap (compared on the ROUNDED
              ratios, so both engines tie-break identically)
  dedup       doc is not the smallest doc_id of its exact-text group among
              docs that survived the three content stages (Lucene/Lee-style
              keep-min; losers die here, winners continue)
  sample      md5(seed:doc_id) outside the keep fraction (layout-free,
              deterministic — the same doc survives on any cluster)
  kept        survived everything
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from miru_spark.pipeline.sampling import _hash_key, _NIBBLES, _threshold_hex
from miru_spark.pipeline.textqual import (
    lang_id,
    lang_id_oracle_sql,
    repetition_oracle_sql,
    repetition_stats,
    text_quality,
    text_quality_oracle_sql,
)


def clean_corpus(
    docs: DataFrame,
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    max_dup_token: float = 0.90,
    max_top2gram: float = 0.20,
    max_dup5gram: float = 0.30,
    sample_rate: float = 1.0,
    seed: str = "s0",
) -> DataFrame:
    """(doc_id, stage) for every input doc; stage is the first filter that
    removed it, or 'kept'."""
    lng = lang_id(docs).select("doc_id", "pred_lang")
    qual = text_quality(docs).select("doc_id", "n_tokens", "quality_score")
    rep = repetition_stats(docs).select(
        "doc_id", "dup_token_ratio", "top_2gram_ratio", "dup_5gram_ratio"
    )
    flagged = (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_h"))
        .join(lng, "doc_id")
        .join(qual, "doc_id")
        .join(rep, "doc_id")
        .withColumn("f_lang", F.col("pred_lang").isin(*allowed_langs))
        .withColumn(
            "f_quality",
            (F.col("quality_score") >= min_quality)
            & F.col("n_tokens").between(min_tokens, max_tokens),
        )
        .withColumn(
            "f_rep",
            (F.col("dup_token_ratio") <= max_dup_token)
            & (F.col("top_2gram_ratio") <= max_top2gram)
            & (F.col("dup_5gram_ratio") <= max_dup5gram),
        )
    )
    # keep-min exact dedup over the docs still alive after the content
    # stages (a dup whose twin died upstream is NOT a duplicate here —
    # same contract as running dedup on the filtered corpus)
    flagged = flagged.withColumn(
        "alive", F.col("f_lang") & F.col("f_quality") & F.col("f_rep")
    )
    # rank within (text hash, alive): dead twins can't steal rank 1 from a
    # surviving doc; the when() keeps the rank only for survivors. Identity
    # is sha256(text), projected at the scan — the window shuffle ships
    # 32-byte digests and flags, never the document text
    w = Window.partitionBy("text_h", "alive").orderBy("doc_id")
    flagged = flagged.withColumn(
        "dedup_rk", F.when(F.col("alive"), F.row_number().over(w))
    )
    thr = _threshold_hex(sample_rate)
    f_sample = F.substring(_hash_key(seed, F.col("doc_id")), 1, _NIBBLES) < F.lit(thr)
    stage = (
        F.when(~F.col("f_lang"), F.lit("lang"))
        .when(~F.col("f_quality"), F.lit("quality"))
        .when(~F.col("f_rep"), F.lit("repetition"))
        .when(F.col("dedup_rk") > 1, F.lit("dedup"))
        .when(~f_sample, F.lit("sample"))
        .otherwise(F.lit("kept"))
    )
    return flagged.select("doc_id", stage.alias("stage")).orderBy("doc_id")


def _rebind(sql: str, corpus_cte: str) -> str:
    """Point a stage oracle at a derived corpus CTE instead of the
    ``documents`` view (each stage oracle reads it exactly once)."""
    assert sql.count("FROM documents") == 1, "stage oracle shape drifted"
    return sql.replace("FROM documents", f"FROM {corpus_cte}")


def clean_oracle_sql(
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    max_dup_token: float = 0.90,
    max_top2gram: float = 0.20,
    max_dup5gram: float = 0.30,
    sample_rate: float = 1.0,
    seed: str = "s0",
    corpus_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin of :func:`clean_corpus` over ``corpus_sql`` (defaults to
    the documents view; pass a UNION to exercise the dedup stage)."""
    langs = ", ".join("'" + v.replace("'", "''") + "'" for v in allowed_langs)
    thr = _threshold_hex(sample_rate)
    return f"""
WITH corpus AS ({corpus_sql}),
lng AS (SELECT doc_id, pred_lang FROM ({_rebind(lang_id_oracle_sql(), "corpus")})),
qual AS (SELECT doc_id, n_tokens, quality_score
         FROM ({_rebind(text_quality_oracle_sql(), "corpus")})),
rep AS (SELECT doc_id, dup_token_ratio, top_2gram_ratio, dup_5gram_ratio
        FROM ({_rebind(repetition_oracle_sql(), "corpus")})),
flag AS (
  SELECT c.doc_id, c.text,
         (pred_lang IN ({langs})) AS f_lang,
         (quality_score >= {float(min_quality)!r}
          AND n_tokens BETWEEN {int(min_tokens)} AND {int(max_tokens)}) AS f_quality,
         (dup_token_ratio <= {float(max_dup_token)!r}
          AND top_2gram_ratio <= {float(max_top2gram)!r}
          AND dup_5gram_ratio <= {float(max_dup5gram)!r}) AS f_rep
  FROM corpus c JOIN lng USING(doc_id) JOIN qual USING(doc_id)
       JOIN rep USING(doc_id)),
ded AS (SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rk
        FROM flag WHERE f_lang AND f_quality AND f_rep)
SELECT f.doc_id,
       CASE WHEN NOT f_lang THEN 'lang'
            WHEN NOT f_quality THEN 'quality'
            WHEN NOT f_rep THEN 'repetition'
            WHEN d.rk > 1 THEN 'dedup'
            WHEN substring(md5('{seed}:' || CAST(f.doc_id AS VARCHAR)), 1, {_NIBBLES})
                 >= '{thr}' THEN 'sample'
            ELSE 'kept' END AS stage
FROM flag f LEFT JOIN ded d USING(doc_id)
ORDER BY f.doc_id
""".strip()
