"""Round 5b — ES time-series / sampling aggs over events
(plans/events_aggs.py): date_histogram, date_range, auto_date_histogram,
diversified_sampler, top_metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.plans.events_aggs import (
    _DR,
    SQL_AUTO_HISTOGRAM,
    SQL_DATE_HISTOGRAM,
    SQL_DATE_RANGE,
    SQL_DIVERSIFIED,
    SQL_TOP_METRICS,
    SQL_WEIGHTED_AVG,
    auto_date_histogram,
    date_range_agg,
    diversified_sampler,
    events_df,
    q_auto_histogram,
    q_date_histogram,
    q_date_range,
    q_diversified,
    q_top_metrics,
    q_weighted_avg,
    top_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qfn,sql",
    [
        (q_date_histogram, SQL_DATE_HISTOGRAM),
        (q_date_range, SQL_DATE_RANGE),
        (q_auto_histogram, SQL_AUTO_HISTOGRAM),
        (q_diversified, SQL_DIVERSIFIED),
        (q_top_metrics, SQL_TOP_METRICS),
        (q_weighted_avg, SQL_WEIGHTED_AVG),
    ],
    ids=["date_histogram", "date_range", "auto", "diversified", "top_metrics",
         "weighted_avg"],
)
def test_events_aggs_match_oracle(spark, duck, qfn, sql):
    got = _rows(qfn(spark, SF_DIR))
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want
    assert got, "vacuous case"


def test_date_range_contract(spark):
    rows = {r["range_key"]: r for r in q_date_range(spark, SF_DIR).collect()}
    # empty bucket still emitted, with zeroed metrics
    assert rows["empty_past"]["n"] == 0
    assert rows["empty_past"]["sum_value"] == 0.0
    # jan_h1 is a subset of the overlapping jan_all bucket
    assert rows["jan_h1"]["n"] <= rows["jan_all"]["n"]
    ev = events_df(spark, SF_DIR)
    total = ev.count()
    # jan_all + open_tail + the gap between them covers everything once:
    # jan_all's n plus events in [feb, mar) plus open_tail equals total
    gap = ev.filter(
        (F.col("ts") >= "2024-02-01") & (F.col("ts") < "2024-03-01")
    ).count()
    assert rows["jan_all"]["n"] + gap + rows["open_tail"]["n"] == total


def test_auto_histogram_picks_finest_fitting_unit(spark):
    ev = events_df(spark, SF_DIR)
    # the testdata spans ~1 month: day fits 40, hour needs ~720
    unit_40 = auto_date_histogram(ev, target=40).select("unit").first()["unit"]
    assert unit_40 == "day"
    unit_big = auto_date_histogram(ev, target=10**6).first()["unit"]
    assert unit_big == "minute"
    unit_small = auto_date_histogram(ev, target=2).first()["unit"]
    assert unit_small == "month"
    # bucket count actually fits the target for the day pick
    n_buckets = auto_date_histogram(ev, target=40).count()
    assert n_buckets <= 40


def test_diversified_caps_per_diversity_value(spark):
    ev = events_df(spark, SF_DIR)
    capped = diversified_sampler(ev, diversity="user_id", max_per=3)
    n_sampled = capped.agg(F.sum("n")).collect()[0][0]
    n_users = ev.select("user_id").distinct().count()
    assert n_sampled <= 3 * n_users
    # deterministic: same seed -> identical rows; different seed -> a
    # different (but equally capped) sample
    a = _rows(diversified_sampler(ev, max_per=3, seed="s0"))
    b = _rows(diversified_sampler(ev, max_per=3, seed="s0"))
    c = _rows(diversified_sampler(ev, max_per=3, seed="other"))
    assert a == b
    assert a != c
    # a genuinely dominant user can't dominate: every user contributes
    # at most 3 of the sampled events by construction of the window
    per_user = (
        ev.withColumn(
            "__rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id")
                .orderBy(
                    F.md5(F.concat_ws(":", F.lit("s0"),
                                      F.col("event_id").cast("string"))),
                    F.col("event_id"),
                )
            ),
        )
        .filter(F.col("__rn") <= 3)
        .groupBy("user_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_user <= 3


def test_top_metrics_is_latest_row_per_bucket(spark):
    ev = events_df(spark, SF_DIR).collect()
    best = {}
    for r in ev:
        key = r["event_type"]
        cand = (r["ts"], -r["event_id"])  # latest ts, lowest id tiebreak
        if key not in best or cand > best[key][0]:
            best[key] = (cand, r)
    got = {
        r["event_type"]: (r["top_ts"], round(r["top_value"], 6))
        for r in q_top_metrics(spark, SF_DIR).collect()
    }
    exp = {
        k: (v[1]["ts"], round(v[1]["value"], 6)) for k, v in best.items()
    }
    assert got == exp


def test_events_aggs_plans_are_jvm_side(spark):
    for df in (
        q_date_histogram(spark, SF_DIR),
        q_date_range(spark, SF_DIR),
        q_auto_histogram(spark, SF_DIR),
        q_diversified(spark, SF_DIR),
        q_top_metrics(spark, SF_DIR),
        q_weighted_avg(spark, SF_DIR),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan


def test_weighted_avg_contract(spark):
    """w_avg is a true weighted mean: it sits inside [min, max] of the
    bucket's rounded values, differs from the unweighted mean somewhere
    (weights genuinely vary), and a constant weight degrades to the plain
    mean."""
    from miru_spark.plans.events_aggs import weighted_avg

    ev = events_df(spark, SF_DIR)
    got = {r["event_type"]: r for r in q_weighted_avg(spark, SF_DIR).collect()}
    plain = {
        r["event_type"]: (r["lo"], r["hi"], r["mean"])
        for r in ev.groupBy("event_type").agg(
            F.min(F.round("value", 2)).alias("lo"),
            F.max(F.round("value", 2)).alias("hi"),
            F.avg(F.round("value", 2)).alias("mean"),
        ).collect()
    }
    assert set(got) == set(plain) and got
    diff_seen = False
    for et, r in got.items():
        lo, hi, mean = plain[et]
        assert float(lo) <= r["w_avg"] <= float(hi)
        diff_seen |= abs(r["w_avg"] - mean) > 1e-9
    assert diff_seen, "weights never changed any bucket's mean (vacuous)"
    # constant weight == plain mean (to the shared rounding)
    const = weighted_avg(ev.withColumn("props", F.lit("xx")))
    for r in const.collect():
        assert abs(r["w_avg"] - plain[r["event_type"]][2]) < 5e-7
