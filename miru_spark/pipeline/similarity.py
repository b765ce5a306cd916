"""Similarity search over an embedding column (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k by cosine: JVM-side
  ``F.zip_with``/``F.aggregate`` dot product (whole-stage codegen, no
  Python), the correctness baseline; oracle-checked against DuckDB's
  ``list_cosine_similarity``.
* ``ann_lsh_topk`` — random-hyperplane LSH: sign-bit signatures ->
  hamming-band buckets -> exact re-rank of candidates only. The scale path:
  candidate generation is a bucket equi-join, never a cross join.
* ``ann_ivf_topk`` — IVF: k-means centroids (numpy, seeded, trained on a
  bounded driver-side sample), cluster assignment as a broadcast-literal
  argmax, probe the nearest ``n_probe`` clusters, exact re-rank within.
* ``cosine_near_pairs`` — all pairs >= threshold (brute force at test scale;
  the LSH bucket join is the scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """(vec_id, cos) top-k by cosine to the query vector; ties by vec_id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_col(F.col("embedding"), q), round_digits)
    return (
        embeddings.select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_oracle_sql(query_vec: list[float], k: int = 10, round_digits: int = 6) -> str:
    vec = "[" + ", ".join(f"{float(x)!r}" for x in query_vec) + "]::DOUBLE[]"
    return f"""
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], {vec}), {round_digits}) AS cos
FROM embeddings ORDER BY cos DESC, vec_id ASC LIMIT {k}
""".strip()


def cosine_near_pairs(
    embeddings: DataFrame, threshold: float = 0.5, round_digits: int = 6
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold — exact baseline."""
    a = embeddings.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b")
    )
    cos = F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), round_digits)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    )


def cosine_near_pairs_oracle_sql(threshold: float = 0.5, round_digits: int = 6) -> str:
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
             {round_digits}) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
            {round_digits}) >= {threshold}
ORDER BY id_a, id_b
""".strip()


# -------------------------------------------------------------------- LSH --

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_bits, dim))


def lsh_signature_df(
    embeddings: DataFrame, dim: int = 64, n_bits: int = 16, seed: int = 42
) -> DataFrame:
    """(vec_id, embedding, bucket) — sign-bit bucket of the random-hyperplane
    projection; vectorized matrix multiply per Arrow batch."""
    H = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(T.LongType())
    def bucket_udf(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy())
        proj = M @ H.T  # (n, bits)
        bits = (proj > 0).astype(np.uint64)
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return embeddings.withColumn("bucket", bucket_udf(F.col("embedding")))


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int = 64,
    n_bits: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose bucket is within
    ``max_hamming`` bits of the query's bucket, re-ranked exactly."""
    H = _hyperplanes(dim, n_bits, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = (H @ qv > 0).astype(np.uint64)
    qbucket = int((qbits * (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))).sum())

    sig = lsh_signature_df(embeddings, dim, n_bits, seed)
    cand = sig.filter(
        F.expr(f"bit_count(bucket ^ {qbucket}l)") <= max_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_col(F.col("embedding"), q), round_digits)
    return (
        cand.select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


# -------------------------------------------------------------------- IVF --

def kmeans_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    sample_limit: int = 100_000,
) -> np.ndarray:
    """Seeded numpy Lloyd iterations on a bounded driver-side sample (at
    10^12 scale the sample, not the corpus, bounds driver memory)."""
    rows = (
        embeddings.select("embedding").limit(sample_limit).toPandas()["embedding"]
    )
    X = np.stack(rows.to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(X.shape[0], size=n_clusters, replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                centroids[c] = X[m].mean(axis=0)
    return centroids


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    C = centroids

    @F.pandas_udf(T.IntegerType())
    def assign_udf(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy()).astype(np.float64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return embeddings.withColumn("cluster", assign_udf(F.col("embedding")))


def ann_ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_digits: int = 6,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF probe: exact re-rank inside the ``n_probe`` nearest clusters."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_clusters, seed=seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    order = (((centroids - qv[None, :]) ** 2).sum(axis=1)).argsort()[:n_probe]
    probe = [int(c) for c in order]
    assigned = ivf_assign(embeddings, centroids)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_col(F.col("embedding"), q), round_digits)
    return (
        assigned.filter(F.col("cluster").isin(probe))
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
