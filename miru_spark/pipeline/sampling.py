"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-dependent on PARTITIONING (each task draws its own
stream), so the same corpus sampled under two cluster layouts yields two
different datasets — useless for reproducible training mixes. These
operators key every decision on a content/id hash instead, so membership is
a pure function of the row: stable across cluster sizes, re-runs, engines
(md5 is bit-identical in Spark and DuckDB — both oracle-checked), and
incremental appends (a doc's verdict never changes when others arrive).

* :func:`hash_sample` — Bernoulli(rate) by md5 hex threshold. The filter is
  a narrow projection: no shuffle, pushes below joins, scans stay columnar.
* :func:`stratified_sample` — fixed quota per stratum via one window shuffle
  keyed by the stratum; hash order inside each stratum makes the quota a
  uniform draw. Catalyst rewrites the rank<=n filter into a per-partition
  top-n (no full sort of each stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NIBBLES = 8  # compare the first 8 hex chars: granularity 16^-8 ~= 2.3e-10


def _hash_key(seed: str, col) -> F.Column:
    return F.md5(F.concat_ws(":", F.lit(seed), col.cast("string")))


def _threshold_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    v = int(round(rate * 16**_NIBBLES))
    if v >= 16**_NIBBLES:
        return "g"  # sorts after every hex string: keep everything
    return format(v, f"0{_NIBBLES}x")


def hash_sample(
    docs: DataFrame, rate: float, seed: str = "s0", key_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff md5(seed:key)'s first 8 hex chars < threshold(rate).

    Lexicographic hex comparison == numeric comparison of the top 32 hash
    bits, so P(keep) = rate to within 2^-32 and membership is independent,
    deterministic, and layout-free.
    """
    thr = _threshold_hex(rate)
    key = _hash_key(seed, F.col(key_col))
    return docs.filter(F.substring(key, 1, _NIBBLES) < F.lit(thr))


def hash_sample_oracle_sql(rate: float, seed: str = "s0") -> str:
    thr = _threshold_hex(rate)
    return f"""
SELECT doc_id FROM documents
WHERE substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, {_NIBBLES}) < '{thr}'
ORDER BY doc_id
""".strip()


def stratified_sample(
    docs: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    seed: str = "s0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Up to ``n_per_stratum`` rows per stratum, drawn by hash order.

    One shuffle on the stratum column; within each stratum rows rank by
    their md5 key (uniform, deterministic), tie-broken by the key column so
    the draw is total-ordered even under hash collisions.
    """
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    key = _hash_key(seed, F.col(key_col))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(key_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def stratified_sample_oracle_sql(
    n_per_stratum: int, strata_col: str = "source", seed: str = "s0"
) -> str:
    return f"""
SELECT {strata_col}, doc_id FROM (
  SELECT {strata_col}, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY {strata_col}
           ORDER BY md5('{seed}:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= {n_per_stratum} ORDER BY {strata_col}, doc_id
""".strip()
