"""Time-series & sampling aggregations over the events stream — the ES
date/sampling agg family (round 5): ``date_histogram``, ``date_range``,
``auto_date_histogram``, ``diversified_sampler``, ``top_metrics``.

All five are pure codegen DataFrame plans (no UDF, no collect of anything
row-scaled) with 1:1 DuckDB twins, riding the ``rel_scalar_funcs``
composite like the geo family.

Float discipline: ``value`` carries <= 2 decimals, so sums accumulate as
``DECIMAL(18,2)`` (exact, partition-merge-order independent) and cast back
to double — the Tier-B money-sum protocol, never a raw double sum.

Timestamp discipline: the session timezone is pinned UTC (session.py), the
testdata timestamps are naive micros, and the streaming suite already
value-oracles raw timestamps cross-engine — buckets are emitted as
timestamps, not strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALUE_SUM = "CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE)"


def _value_sum():
    return F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).cast(
        "double"
    )


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def date_histogram(df: DataFrame, unit: str = "day") -> DataFrame:
    """ES ``date_histogram`` (calendar_interval): one map-side-combined
    hash agg keyed on ``date_trunc`` — the shuffle carries one row per
    (bucket) at any corpus size."""
    return (
        df.groupBy(F.date_trunc(unit, "ts").alias("bucket_ts"))
        .agg(F.count("*").alias("n"), _value_sum().alias("sum_value"))
        .orderBy("bucket_ts")
    )


def date_histogram_sql(unit: str = "day") -> str:
    return f"""
SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n, {VALUE_SUM} AS sum_value
FROM events GROUP BY 1 ORDER BY bucket_ts
""".strip()


def date_range_agg(df: DataFrame, ranges) -> DataFrame:
    """ES ``date_range``: explicit [from, to) buckets — open bounds
    allowed, buckets may overlap (each range is an independent filter,
    exact ES semantics), empty buckets still emit n=0. ONE hash agg with
    every range a conditional sum — |ranges| longs per partition
    regardless of corpus size (the A82 range-agg plan shape on a
    timestamp column)."""
    aggs = []
    for i, (_, lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp"))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__n{i}")
        )
        aggs.append(
            F.sum(
                F.when(
                    cond, F.round(F.col("value"), 2).cast("decimal(18,2)")
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias(f"__s{i}")
        )
    row = df.agg(*aggs)
    buckets = F.array(
        *[
            F.struct(
                F.lit(name).alias("range_key"),
                F.col(f"__n{i}").alias("n"),
                F.col(f"__s{i}").alias("sum_value"),
            )
            for i, (name, _, _) in enumerate(ranges)
        ]
    )
    return (
        row.select(F.explode(buckets).alias("b"))
        .select("b.range_key", "b.n", "b.sum_value")
        .orderBy("range_key")
    )


def date_range_agg_sql(ranges) -> str:
    branches = []
    for name, lo, hi in ranges:
        conds = ["TRUE"]
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        w = " AND ".join(conds)
        branches.append(
            f"SELECT '{name}' AS range_key,\n"
            f"  CAST(count(*) FILTER (WHERE {w}) AS BIGINT) AS n,\n"
            f"  CAST(coalesce(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) "
            f"FILTER (WHERE {w}), 0) AS DOUBLE) AS sum_value\n"
            "FROM events"
        )
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(branches)
        + "\n) ORDER BY range_key"
    )


# auto_date_histogram interval ladder: (unit, nominal seconds). The month
# entry uses the 30-day approximation for the CHOICE only (the buckets
# themselves are true calendar months via date_trunc) — ES's rounding is
# similarly estimate-based; the approximation is pinned spec here.
AUTO_LADDER = (
    ("minute", 60),
    ("hour", 3_600),
    ("day", 86_400),
    ("month", 2_592_000),
)


def auto_date_histogram(df: DataFrame, target: int = 20) -> DataFrame:
    """ES ``auto_date_histogram``: pick the FINEST ladder interval whose
    estimated bucket count ``floor(span / unit_seconds) + 1`` fits the
    target, then histogram at it. The span comes from one min/max agg (a
    single row — broadcast back, never collected), the choice is a CASE
    over the pinned ladder evaluated identically by the SQL twin, and the
    dynamic-unit truncation is a CASE over date_trunc calls — everything
    stays in codegen."""
    span = df.agg(
        F.min("ts").alias("__tmin"), F.max("ts").alias("__tmax")
    ).select(
        (
            F.unix_timestamp("__tmax") - F.unix_timestamp("__tmin")
        ).alias("__span")
    )
    unit = F.lit(AUTO_LADDER[-1][0])
    for u, secs in reversed(AUTO_LADDER[:-1]):
        unit = F.when(
            F.floor(F.col("__span") / secs) + 1 <= target, F.lit(u)
        ).otherwise(unit)
    picked = span.select(unit.alias("unit"))
    joined = df.crossJoin(F.broadcast(picked))
    bucket = F.col("ts")
    for u, _ in AUTO_LADDER:
        bucket = F.when(
            F.col("unit") == u, F.date_trunc(u, "ts")
        ).otherwise(bucket)
    return (
        joined.groupBy("unit", bucket.alias("bucket_ts"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket_ts")
    )


def auto_date_histogram_sql(target: int = 20) -> str:
    unit_case = f"'{AUTO_LADDER[-1][0]}'"
    for u, secs in reversed(AUTO_LADDER[:-1]):
        unit_case = (
            f"CASE WHEN floor(__span / {secs}) + 1 <= {target} "
            f"THEN '{u}' ELSE {unit_case} END"
        )
    bucket_case = "ts"
    for u, _ in AUTO_LADDER:
        bucket_case = (
            f"CASE WHEN unit = '{u}' THEN date_trunc('{u}', ts) "
            f"ELSE {bucket_case} END"
        )
    return f"""
WITH s AS (SELECT CAST(epoch(max(ts)) AS BIGINT)
                  - CAST(epoch(min(ts)) AS BIGINT) AS __span FROM events),
p AS (SELECT {unit_case} AS unit FROM s)
SELECT unit, CAST({bucket_case} AS TIMESTAMP) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n
FROM events, p GROUP BY 1, 2 ORDER BY bucket_ts
""".strip()


def diversified_sampler(
    df: DataFrame,
    diversity: str = "user_id",
    max_per: int = 3,
    seed: str = "s0",
) -> DataFrame:
    """ES ``diversified_sampler``: downstream aggs run over a sample
    capped at ``max_per`` docs per diversity value — the anti-skew
    sampler ("no single user dominates the agg"). ES draws per shard;
    this engine draws by md5(seed:event_id) order per diversity bucket
    (one window shuffle keyed on the diversity field), so the sample is
    deterministic, layout-free, and value-oracle-able — the same
    reproducibility upgrade as the A89 random_sampler. Downstream agg
    here: per-event_type count + exact sum."""
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("event_id").cast("string"))
    )
    w = Window.partitionBy(diversity).orderBy(key, F.col("event_id"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), _value_sum().alias("sum_value"))
        .orderBy("event_type")
    )


def diversified_sampler_sql(
    diversity: str = "user_id", max_per: int = 3, seed: str = "s0"
) -> str:
    return f"""
WITH r AS (SELECT event_type, value,
                  row_number() OVER (
                    PARTITION BY {diversity}
                    ORDER BY md5('{seed}:' || CAST(event_id AS VARCHAR)),
                             event_id) AS rn
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n, {VALUE_SUM} AS sum_value
FROM r WHERE rn <= {max_per}
GROUP BY event_type ORDER BY event_type
""".strip()


def top_metrics(df: DataFrame, by: str = "event_type") -> DataFrame:
    """ES ``top_metrics``: per bucket, the metric values of the single
    top row by sort field (here: latest ``ts``, event_id tiebreak) — the
    "current reading per device" query. One window shuffle keyed on the
    bucket; no self-join, no collect."""
    w = Window.partitionBy(by).orderBy(
        F.desc("ts"), F.asc("event_id")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            by,
            F.col("ts").alias("top_ts"),
            F.round("value", 6).alias("top_value"),
        )
        .orderBy(by)
    )


def top_metrics_sql(by: str = "event_type") -> str:
    return f"""
WITH r AS (SELECT {by}, ts, value,
                  row_number() OVER (PARTITION BY {by}
                                     ORDER BY ts DESC, event_id) AS rn
           FROM events)
SELECT {by}, CAST(ts AS TIMESTAMP) AS top_ts, round(value, 6) AS top_value
FROM r WHERE rn = 1 ORDER BY {by}
""".strip()


def weighted_avg(df: DataFrame, by: str = "event_type") -> DataFrame:
    """ES ``weighted_avg``: per bucket, the value metric averaged under a
    per-row weight field (here weight = char length of the ``props``
    payload — the deterministic stand-in for a weight column, exactly the
    value_field/weight_field shape of the ES agg). Exact-decimal inner
    sums keep the result partition-merge-order independent (same
    discipline as :func:`date_histogram`'s value sums): round(value, 2)
    casts to DECIMAL(18,2), multiplies by the integer weight (still
    exact), sums exactly, and divides ONCE at the end — one
    map-side-combined hash agg, a handful of numbers per partition at any
    scale."""
    w = F.length("props").cast("long")
    v = F.round(F.col("value"), 2).cast("decimal(18,2)")
    return (
        df.groupBy(by)
        .agg(
            F.count("*").alias("n"),
            F.sum(w).alias("sum_w"),
            F.sum(v * w).alias("__swv"),
        )
        .select(
            by,
            "n",
            "sum_w",
            F.round(
                F.col("__swv").cast("double") / F.col("sum_w").cast("double"),
                6,
            ).alias("w_avg"),
        )
        .orderBy(by)
    )


def weighted_avg_sql(by: str = "event_type") -> str:
    return f"""
SELECT {by}, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(props)) AS BIGINT) AS sum_w,
       round(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)) * length(props))
                  AS DOUBLE)
             / CAST(sum(length(props)) AS DOUBLE), 6) AS w_avg
FROM events GROUP BY {by} ORDER BY {by}
""".strip()


# ---------------------------------------------------------------------------
# driver registry cases (members of the rel_scalar_funcs composite)

_DR = [
    ("jan_h1", "2024-01-01 00:00:00", "2024-01-15 00:00:00"),
    ("jan_all", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),  # overlaps
    ("open_tail", "2024-03-01 00:00:00", None),
    ("empty_past", None, "2000-01-01 00:00:00"),
]


def q_date_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return date_histogram(events_df(spark, sf), "day")


SQL_DATE_HISTOGRAM = date_histogram_sql("day")


def q_date_range(spark: SparkSession, sf: str) -> DataFrame:
    return date_range_agg(events_df(spark, sf), _DR)


SQL_DATE_RANGE = date_range_agg_sql(_DR)


def q_auto_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return auto_date_histogram(events_df(spark, sf), target=40)


SQL_AUTO_HISTOGRAM = auto_date_histogram_sql(target=40)


def q_diversified(spark: SparkSession, sf: str) -> DataFrame:
    return diversified_sampler(events_df(spark, sf))


SQL_DIVERSIFIED = diversified_sampler_sql()


def q_top_metrics(spark: SparkSession, sf: str) -> DataFrame:
    return top_metrics(events_df(spark, sf))


SQL_TOP_METRICS = top_metrics_sql()


def q_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    return weighted_avg(events_df(spark, sf))


SQL_WEIGHTED_AVG = weighted_avg_sql()
