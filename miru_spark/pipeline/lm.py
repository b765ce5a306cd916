"""N-gram language-model perplexity scoring — the CCNet quality signal.

CCNet (Wenzek et al. 2020) ranks web text by the perplexity of a language
model trained on a trusted corpus; low-perplexity text reads like the
reference, high-perplexity text is boilerplate/garble. The production stack
uses KenLM; the Spark-native equivalent here is an exact add-k-smoothed
bigram model whose training AND scoring are single hash-agg / join plans:

  train:  one pass -> bigram counts c(w1,w2), unigram counts c(w1), |V|
          (all map-side combinable; the model IS a DataFrame, so a 100-TB
          corpus trains with two shuffles and no driver materialization)
  score:  per-doc bigrams LEFT JOIN the count tables ->
          P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*|V|)
          nll = -mean ln P over the doc's bigrams, ppl = exp(nll)

Smoothing is add-k (k=0.5 default), so unseen bigrams cost
-ln(k / (c(w1)+k|V|)) instead of -inf; docs with < 2 tokens have no
bigrams and score NULL. Scoring joins co-key on the bigram/unigram, and
the model tables broadcast when small (AQE decides, no forced hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    pair = F.expr(
        "transform(sequence(1, size(toks)-1), "
        "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))"
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(pair).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram counts, unigram counts, vocab size) over the corpus."""
    bg = _bigrams(docs, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    uni = (
        docs.select(F.explode(toks).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    return bg, uni, uni.count()


def perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    k: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, ppl) — add-k bigram perplexity of each
    doc under the trained model; docs with < 2 tokens are absent."""
    if k <= 0:
        raise ValueError("smoothing k must be > 0")
    db = _bigrams(docs, text_col)
    joined = (
        db.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .select(
            "doc_id",
            (
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k) * vocab_size))
            ).alias("p"),
        )
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.avg(F.log("p"))).alias("nll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("nll", 6).alias("avg_nll"),
            F.round(F.exp("nll"), 6).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def perplexity_oracle_sql(k: float = 0.5) -> str:
    """DuckDB twin: self-trained bigram LM over the documents view, same
    add-k smoothing, same per-doc mean negative log likelihood."""
    kf = float(k)
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents),
db AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
       FROM toks, UNNEST(range(1, len(l))) AS u(i)
       WHERE len(l) >= 2),
bg AS (SELECT w1, w2, count(*) c12 FROM db GROUP BY 1, 2),
uni AS (SELECT w1, count(*) c1
        FROM (SELECT unnest(l) AS w1 FROM toks) GROUP BY 1),
v AS (SELECT count(*)::DOUBLE nv FROM uni),
p AS (SELECT db.doc_id,
             (COALESCE(bg.c12, 0) + {kf!r})
             / (COALESCE(uni.c1, 0) + {kf!r} * v.nv) AS p
      FROM db LEFT JOIN bg USING(w1, w2) LEFT JOIN uni USING(w1), v),
s AS (SELECT doc_id, count(*) n_bigrams, -avg(ln(p)) nll
      FROM p GROUP BY 1)
SELECT doc_id, n_bigrams, round(nll, 6) AS avg_nll, round(exp(nll), 6) AS ppl
FROM s ORDER BY doc_id
""".strip()


def ccnet_buckets(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    k: float = 0.5,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing (Wenzek et al. 2020
    §4.3): PER LANGUAGE, rank docs by LM perplexity ascending and split
    into terciles — ``head`` is the best-reading third, the slice CCNet
    feeds to pretraining first. Per-language is load-bearing: perplexity
    scales differ across languages, so a global cut would silently drop
    whole languages.

    (doc_id, lang, ppl, bucket) — docs with < 2 tokens (no bigrams) are
    absent, as in :func:`perplexity`. Ranking uses the ROUNDED ppl with a
    doc_id tiebreak so the tercile boundary is engine-independent; NTILE
    follows the SQL-standard larger-buckets-first fill both engines share.
    Plan: the perplexity hash-agg/join plan unchanged + ONE window shuffle
    keyed on the language — at corpus scale each language's ranking is an
    independent partition, no global sort."""
    from pyspark.sql import Window

    ppl = perplexity(docs, bigrams, unigrams, vocab_size, k, text_col)
    j = ppl.join(docs.select("doc_id", lang_col), "doc_id")
    w = Window.partitionBy(lang_col).orderBy("ppl", "doc_id")
    tile = F.ntile(3).over(w)
    bucket = (
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # named ppl_bucket (not 'bucket') so composite unions never collide
    # with numeric bucket columns from sibling aggregation members
    return j.select(
        "doc_id", F.col(lang_col).alias("lang"), "ppl",
        bucket.alias("ppl_bucket"),
    ).orderBy("doc_id")


def ccnet_buckets_oracle_sql(k: float = 0.5) -> str:
    """DuckDB twin: the perplexity CTE chain + the same per-lang NTILE(3)
    over (rounded ppl, doc_id)."""
    inner = perplexity_oracle_sql(k)
    return f"""
WITH px AS ({inner}),
t AS (SELECT px.doc_id, documents.lang, px.ppl,
             ntile(3) OVER (PARTITION BY documents.lang
                            ORDER BY px.ppl, px.doc_id) AS tile
      FROM px JOIN documents USING(doc_id))
SELECT doc_id, lang, ppl,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM t ORDER BY doc_id
""".strip()
