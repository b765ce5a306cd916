"""DSIR — data selection via hashed-n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling"): to select raw-corpus documents that *look like* a target
distribution, fit two bag-of-hashed-n-gram models — one on the target set,
one on the raw corpus — and weight each raw document by its log likelihood
ratio; the highest-weight documents are the target-like subset.

Shape at 100 TB:

* one corpus pass explodes word bigrams and maps each through a stable
  md5 bucket hash (``B`` buckets — the hashing trick bounds model size
  regardless of vocabulary);
* TRAIN pass: exploded grams collapse into per-bucket counts — one
  map-side-combined hash agg whose result is at most ``B`` rows, collected
  to the driver (bounded by construction, the same discipline as the
  eval-set grams in ``pipeline.bloom``) with the two totals folded into a
  scalar constant;
* SCORE pass: the corpus explodes once more into per-(doc, bucket) counts
  and broadcast-joins the tiny lineage-free model table — shuffle
  proportional to distinct buckets per doc, never to model or corpus size.

Two corpus passes total (train + score — the ``pipeline.lm`` shape); a
lazy three-consumer lineage would silently re-run the corpus explode per
consumer instead.

The bucket hash (first 15 md5 hex chars → integer mod B) is bit-identical
in Spark and DuckDB, so the whole operator is value-oracled; add-one
(Laplace) smoothing keeps unseen buckets finite on both sides. The log
weight is rounded BEFORE the order-by (registry float policy) so top-k
tie-breaks agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = 15  # 15 hex chars < 2^60: exact in BIGINT arithmetic on both engines


def _bigrams(toks) -> F.Column:
    expr = (
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    return F.when(F.size(toks) >= 2, F.expr(expr)).otherwise(
        F.expr("array()").cast("array<string>")
    )


def dsir_weights(
    docs: DataFrame,
    target_predicate: str,
    n_buckets: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight against a target subset.

    ``target_predicate`` is a SQL boolean over the corpus columns (e.g.
    ``"lang = 'en'"``) naming the in-corpus proxy of the target
    distribution; the raw model is the whole corpus. Returns
    (doc_id, n_bigrams, log_w) for every document, ``log_w`` rounded.
    Documents with no bigrams get log_w = 0 (an empty product).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    toks = F.array_remove(F.split(F.col("text"), " "), "")
    is_target = F.expr(target_predicate)
    grams = (
        docs.select("doc_id", is_target.alias("_t"), toks.alias("toks"))
        .select("doc_id", "_t", F.explode(_bigrams(F.col("toks"))).alias("g"))
        .withColumn(
            "b",
            F.conv(F.substring(F.md5("g"), 1, _HEX), 16, 10).cast("long")
            % n_buckets,
        )
        # the joins downstream infer isnotnull on their keys and push it
        # into ONE consumer's copy of this subtree; stating the (vacuously
        # true) filters here keeps every consumer's subtree canonical-equal
        # so ReuseExchange computes the trunk shuffle once per action
        .filter(F.col("doc_id").isNotNull() & F.col("b").isNotNull())
    )
    # TRAIN: per-bucket model, <= n_buckets rows by construction, so the
    # collect is bounded regardless of corpus size; a lazy model lineage
    # would re-run the corpus explode once per downstream consumer
    model_rows = (
        grams.groupBy("b")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
            F.count("*").alias("cr"),
        )
        .collect()
    )
    spark = docs.sparkSession
    model = spark.createDataFrame(
        [(int(r["b"]), int(r["ct"]), int(r["cr"])) for r in model_rows],
        "b long, ct long, cr long",
    )
    Tt = sum(int(r["ct"]) for r in model_rows)
    Tr = sum(int(r["cr"]) for r in model_rows)
    # per-bigram contribution with add-one smoothing:
    #   log((ct+1)/(Tt+B)) - log((cr+1)/(Tr+B))
    #   = log(ct+1) - log(cr+1) + [log(Tr+B) - log(Tt+B)]   (constant term,
    #     folded driver-side — Spark and DuckDB lit doubles agree exactly)
    import math

    const = math.log(Tr + float(n_buckets)) - math.log(Tt + float(n_buckets))
    # SCORE: per-(doc, bucket) counts join the tiny lineage-free model
    db = grams.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    scored = (
        db.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(
                F.col("c") * (F.log(F.col("ct") + 1.0) - F.log(F.col("cr") + 1.0))
            ).alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("_s") + F.col("n_bigrams") * F.lit(const)).alias("_lw"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce("_lw", F.lit(0.0)), round_digits).alias("log_w"),
        )
        .orderBy("doc_id")
    )


def dsir_resample(
    docs: DataFrame,
    target_predicate: str,
    k: int,
    n_buckets: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k raw documents by DSIR weight — the selected training subset."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_weights(docs, target_predicate, n_buckets, round_digits)
    return (
        w.orderBy(F.desc("log_w"), "doc_id")
        .limit(k)
        .select("doc_id", "log_w")
    )


def dsir_oracle_sql(
    target_predicate: str,
    k: int | None = None,
    n_buckets: int = 4096,
    round_digits: int = 6,
) -> str:
    """DuckDB twin of :func:`dsir_weights` / :func:`dsir_resample`."""
    base = rf"""
WITH toks AS (
  SELECT doc_id, ({target_predicate}) AS t,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
g AS (
  SELECT doc_id, t,
         CAST(('0x' || substring(md5(l[i] || ' ' || l[i+1]), 1, {_HEX}))
              AS UBIGINT) % {n_buckets} AS b
  FROM toks, UNNEST(range(1, len(l))) AS u(i)),
db AS (
  SELECT doc_id, t, b, COUNT(*) AS c FROM g GROUP BY doc_id, t, b),
model AS (
  SELECT b, SUM(CASE WHEN t THEN c ELSE 0 END) AS ct, SUM(c) AS cr
  FROM db GROUP BY b),
tot AS (SELECT SUM(ct) AS Tt, SUM(cr) AS Tr FROM model),
scored AS (
  SELECT doc_id, SUM(c) AS n_bigrams,
         SUM(c * (ln(ct + 1.0) - ln(cr + 1.0)))
           + SUM(c) * (ln(Tr + {n_buckets}.0) - ln(Tt + {n_buckets}.0)) AS lw
  FROM db JOIN model USING(b) CROSS JOIN tot
  GROUP BY doc_id, Tt, Tr),
w AS (
  SELECT d.doc_id,
         COALESCE(s.n_bigrams, 0) AS n_bigrams,
         ROUND(COALESCE(s.lw, 0.0), {round_digits}) AS log_w
  FROM documents d LEFT JOIN scored s USING(doc_id))
""".strip()
    if k is None:
        return base + "\nSELECT doc_id, n_bigrams, log_w FROM w ORDER BY doc_id"
    return (
        base
        + f"\nSELECT doc_id, log_w FROM w ORDER BY log_w DESC, doc_id LIMIT {int(k)}"
    )
