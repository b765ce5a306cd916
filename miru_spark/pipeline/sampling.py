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


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-domain acceptance rates that turn the corpus into the LARGEST
    subsample whose expected domain mixture matches ``weights`` (the
    down-sampling-only solution to training-data domain reweighting à la
    Pile/DoReMi mixtures): rate_d = w_d * C / n_d with
    C = min_e(n_e / w_e), so the scarcest domain (relative to its target
    share) keeps rate exactly 1.0 and every other domain down-samples to
    match. Domains absent from ``weights`` get rate 0 (dropped).

    Pure driver-side arithmetic over |domains| numbers; the float
    expression order matches the SQL twin exactly (n/w division, min,
    w*C/n) so thresholds are bit-identical."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive floats")
    missing = [d for d in weights if counts.get(d, 0) <= 0]
    if missing:
        raise ValueError(f"weighted domains absent from corpus: {missing}")
    cmin = min(float(counts[d]) / float(w) for d, w in weights.items())
    return {
        d: min(1.0, float(w) * cmin / float(counts[d]))
        for d, w in weights.items()
    }


def _threshold_hex_sqlround(rate: float) -> str:
    """Hex threshold with floor(x + 0.5) rounding — the form both Python
    and DuckDB compute identically (Python round() is banker's; SQL is
    half-away — floor+0.5 sidesteps both)."""
    import math

    if rate >= 1.0:
        return "g"  # sorts after every hex string: keep everything
    return format(int(math.floor(rate * 16**_NIBBLES + 0.5)), f"0{_NIBBLES}x")


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    seed: str = "s0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture resampling: keep each row iff its md5
    draw clears its DOMAIN's acceptance rate from :func:`mixture_rates` —
    one Bernoulli filter per row, rates chosen so the kept set is the
    largest subsample matching the target mixture in expectation.

    Plan: one |domains|-row counts agg collects to the driver (bounded by
    domain cardinality, never docs), rates become literal hex thresholds
    in a codegen CASE, and the filter itself is the same shuffle-free
    md5-threshold scan as :func:`hash_sample` — layout-independent and
    rerunnable with identical membership at any scale."""
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(domain_col).count().collect()
        if r[0] in weights
    }
    rates = mixture_rates(counts, weights)
    thr = F.lit(None).cast("string")
    for d, r in sorted(rates.items()):
        thr = F.when(
            F.col(domain_col) == d, F.lit(_threshold_hex_sqlround(r))
        ).otherwise(thr)
    key = _hash_key(seed, F.col(key_col))
    return docs.filter(
        thr.isNotNull() & (F.substring(key, 1, _NIBBLES) < thr)
    )


def mixture_sample_oracle_sql(
    weights: dict[str, float], domain_col: str = "lang", seed: str = "s0"
) -> str:
    """Twin of :func:`mixture_sample`: rates derived in SQL from the same
    counts with the same expression order (n/w division, min, w*C/n,
    floor(x*2^32 + 0.5) hex threshold), so the thresholds — and therefore
    the exact membership — cannot drift from a stale inlined rate list."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive floats")
    wvals = ",".join(
        f"('{d}', {float(w)!r})" for d, w in sorted(weights.items())
    )
    return f"""
WITH counts AS (SELECT {domain_col}, count(*) AS n FROM documents GROUP BY 1),
w({domain_col}, wgt) AS (VALUES {wvals}),
c AS (SELECT min(n::DOUBLE / wgt) AS cmin FROM counts JOIN w USING({domain_col})),
thr AS (SELECT {domain_col},
               CASE WHEN wgt * c.cmin / n::DOUBLE >= 1.0 THEN 'g'
                    ELSE printf('%08x', CAST(floor(
                      (wgt * c.cmin / n::DOUBLE) * 4294967296.0 + 0.5
                    ) AS BIGINT)) END AS t
        FROM counts JOIN w USING({domain_col}), c)
SELECT {domain_col}, doc_id
FROM documents JOIN thr USING({domain_col})
WHERE substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, {_NIBBLES}) < t
ORDER BY {domain_col}, doc_id
""".strip()
