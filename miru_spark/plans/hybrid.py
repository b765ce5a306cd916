"""A54 — hybrid search with Reciprocal Rank Fusion (Elasticsearch 8.x
``rrf`` retriever / OpenSearch hybrid query): fuse the lexical BM25
ranking with an embedding-cosine ranking by rank, not by score::

    rrf(d) = sum over rankings R containing d of  1 / (rrf_k + rank_R(d))

RRF is the standard fusion for hybrid lexical+vector retrieval precisely
because the two score distributions are incomparable — ranks are
dimensionless, so no per-query score normalization is needed
(Cormack, Clarke & Buettcher, SIGIR 2009; k=60 is their constant and the
ES default).

Plan shape: both input rankings are top-N bounded (``n_text`` from the
distributed BM25 scan with its existing TakeOrderedAndProject, ``n_vec``
from the brute-force / ANN cosine path), so the rank windows and the
fusion join run over at most ``n_text + n_vec`` rows — driver-scale
arithmetic at the end of two already-pruned distributed plans, never a
corpus-wide window. At cluster scale you'd swap the brute-force cosine
side for the ANN path (pipeline.similarity.ann_lsh_topk / ivf) without
touching the fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.index.reader import IndexReader


def hybrid_rrf(
    reader: IndexReader,
    terms: list[str],
    embeddings: DataFrame,
    query_vec: list[float],
    mode: str = "disjunctive",
    n_text: int = 100,
    n_vec: int = 100,
    rrf_k: int = 60,
    k: int = 10,
    round_digits: int = 6,
    exclude: list[str] | None = None,
) -> DataFrame:
    """(doc_id, score) — RRF fusion of the BM25 top-``n_text`` and the
    cosine top-``n_vec`` (vec_id == doc_id), ordered by (score desc,
    doc_id). Ranks are 1-based over (metric desc, id asc), identical on
    both sides to the oracle's ROW_NUMBER."""
    from pyspark.sql import Window

    from miru_spark.pipeline.similarity import cosine_topk_bruteforce
    from miru_spark.plans.search import search_distributed

    if rrf_k < 0 or k <= 0 or n_text <= 0 or n_vec <= 0:
        raise ValueError("rrf_k must be >= 0 and n_text/n_vec/k positive")
    text = search_distributed(
        reader, terms, mode=mode, k=n_text, round_digits=round_digits,
        exclude=exclude,
    )
    # rank windows run over the already-LIMITed top-N rows only
    tr = text.withColumn(
        "rt",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    ).select("doc_id", "rt")
    vec = cosine_topk_bruteforce(
        embeddings, query_vec, k=n_vec, round_digits=round_digits
    )
    vr = vec.withColumn(
        "rv",
        F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id"))),
    ).select(F.col("vec_id").alias("doc_id"), "rv")
    fused = tr.join(vr, "doc_id", "full_outer")
    kk = float(rrf_k)
    score = F.coalesce(1.0 / (F.lit(kk) + F.col("rt")), F.lit(0.0)) + \
        F.coalesce(1.0 / (F.lit(kk) + F.col("rv")), F.lit(0.0))
    return (
        fused.select(
            "doc_id", F.round(score, round_digits).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_rrf_oracle_sql(
    terms: list[str],
    mode: str = "disjunctive",
    n_text: int = 100,
    n_vec: int = 100,
    rrf_k: int = 60,
    k: int = 10,
    round_digits: int = 6,
    exclude: list[str] | None = None,
    query_vec_sql: str = (
        "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
    ),
) -> str:
    """DuckDB twin: BM25 CTE top-n_text + cosine top-n_vec over the
    embeddings view (query vector read from the view itself so the same
    SQL works at every scale factor), ROW_NUMBER ranks, FULL OUTER JOIN,
    reciprocal-rank sum."""
    from miru_spark.plans.relational import bm25_oracle_sql

    inner = bm25_oracle_sql(
        terms, mode, k=n_text, round_digits=round_digits, exclude=exclude
    )
    return f"""
WITH t AS ({inner}),
tr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) rt
       FROM t),
v AS (SELECT vec_id,
             ROUND(list_cosine_similarity(embedding::DOUBLE[],
                                          {query_vec_sql}),
                   {round_digits}) AS cos
      FROM embeddings ORDER BY cos DESC, vec_id LIMIT {n_vec}),
vr AS (SELECT vec_id AS doc_id,
              ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) rv
       FROM v),
u AS (SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id,
             coalesce(1.0 / ({rrf_k} + rt), 0.0)
           + coalesce(1.0 / ({rrf_k} + rv), 0.0) AS s
      FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
SELECT doc_id, round(s, {round_digits}) AS score
FROM u ORDER BY score DESC, doc_id LIMIT {k}
""".strip()


def hybrid_linear(
    reader: IndexReader,
    terms: list[str],
    embeddings: DataFrame,
    query_vec: list[float],
    mode: str = "disjunctive",
    n_text: int = 100,
    n_vec: int = 100,
    w_text: float = 0.7,
    w_vec: float = 0.3,
    k: int = 10,
    round_digits: int = 6,
    exclude: list[str] | None = None,
) -> DataFrame:
    """A108 — hybrid linear combination (ES 8.14+ ``linear`` retriever with
    the ``minmax`` normalizer): each side's scores min-max normalize WITHIN
    its own retrieved top-N window — the ES contract: normalization is
    per-retriever over the window it returned, never the corpus — then
    ``score = w_text * norm(bm25) + w_vec * norm(cos)``, a doc missing
    from a side contributing 0 there. The rank-free alternative to RRF:
    score MAGNITUDES survive fusion (a runaway best hit stays far ahead),
    at the cost of needing the normalizer RRF avoids. Pinned edge case: a
    constant window (max == min) normalizes to 1.0 for every present doc.

    Same plan economics as :func:`hybrid_rrf`: both windows are top-N
    bounded, the min/max come from a one-row agg broadcast back onto at
    most N rows, and the fusion join touches <= n_text + n_vec rows."""
    from miru_spark.pipeline.similarity import cosine_topk_bruteforce
    from miru_spark.plans.search import search_distributed

    if k <= 0 or n_text <= 0 or n_vec <= 0:
        raise ValueError("n_text/n_vec/k must be positive")
    if w_text < 0 or w_vec < 0 or (w_text == 0 and w_vec == 0):
        raise ValueError("weights must be >= 0 and not both zero")

    def _minmax(df: DataFrame, id_col: str, val_col: str, out: str) -> DataFrame:
        stats = df.agg(
            F.min(val_col).alias("__lo"), F.max(val_col).alias("__hi")
        )
        return df.crossJoin(F.broadcast(stats)).select(
            F.col(id_col).alias("doc_id"),
            F.when(
                F.col("__hi") > F.col("__lo"),
                (F.col(val_col) - F.col("__lo"))
                / (F.col("__hi") - F.col("__lo")),
            )
            .otherwise(F.lit(1.0))
            .alias(out),
        )

    text = search_distributed(
        reader, terms, mode=mode, k=n_text, round_digits=round_digits,
        exclude=exclude,
    )
    tn = _minmax(text, "doc_id", "score", "nt")
    vec = cosine_topk_bruteforce(
        embeddings, query_vec, k=n_vec, round_digits=round_digits
    )
    vn = _minmax(vec, "vec_id", "cos", "nv")
    fused = tn.join(vn, "doc_id", "full_outer")
    score = F.lit(float(w_text)) * F.coalesce("nt", F.lit(0.0)) + F.lit(
        float(w_vec)
    ) * F.coalesce("nv", F.lit(0.0))
    return (
        fused.select("doc_id", F.round(score, round_digits).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_linear_oracle_sql(
    terms: list[str],
    mode: str = "disjunctive",
    n_text: int = 100,
    n_vec: int = 100,
    w_text: float = 0.7,
    w_vec: float = 0.3,
    k: int = 10,
    round_digits: int = 6,
    exclude: list[str] | None = None,
    query_vec_sql: str = (
        "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
    ),
) -> str:
    """DuckDB twin of :func:`hybrid_linear`: identical per-window min-max
    normalization (window MIN/MAX OVER ()), identical constant-window
    pin, identical w_t*nt + w_v*nv expression order."""
    from miru_spark.plans.relational import bm25_oracle_sql

    inner = bm25_oracle_sql(
        terms, mode, k=n_text, round_digits=round_digits, exclude=exclude
    )
    return f"""
WITH t AS ({inner}),
tn AS (SELECT doc_id,
              CASE WHEN MAX(score) OVER () > MIN(score) OVER ()
                   THEN (score - MIN(score) OVER ())
                        / (MAX(score) OVER () - MIN(score) OVER ())
                   ELSE 1.0 END AS nt
       FROM t),
v AS (SELECT vec_id,
             ROUND(list_cosine_similarity(embedding::DOUBLE[],
                                          {query_vec_sql}),
                   {round_digits}) AS cos
      FROM embeddings ORDER BY cos DESC, vec_id LIMIT {n_vec}),
vn AS (SELECT vec_id AS doc_id,
              CASE WHEN MAX(cos) OVER () > MIN(cos) OVER ()
                   THEN (cos - MIN(cos) OVER ())
                        / (MAX(cos) OVER () - MIN(cos) OVER ())
                   ELSE 1.0 END AS nv
       FROM v),
u AS (SELECT coalesce(tn.doc_id, vn.doc_id) AS doc_id,
             {float(w_text)!r} * coalesce(nt, 0.0)
           + {float(w_vec)!r} * coalesce(nv, 0.0) AS s
      FROM tn FULL OUTER JOIN vn ON tn.doc_id = vn.doc_id)
SELECT doc_id, round(s, {round_digits}) AS score
FROM u ORDER BY score DESC, doc_id LIMIT {k}
""".strip()
