"""Round 5 — the ES/Lucene geo family (plans/geo.py): geo_distance query
with bbox prefilter, geo_bounding_box, distance-ring aggregation,
geotile_grid aggregation — all codegen built-ins over a deterministic
derived geo_point, each with a DuckDB twin."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from miru_spark.plans.geo import (
    SQL_GEO_BBOX,
    SQL_GEO_DISTANCE,
    SQL_GEO_RINGS,
    SQL_GEO_TILES,
    bbox_around,
    geo_distance_topk,
    geo_events,
    haversine_m,
    q_geo_bbox,
    q_geo_distance,
    q_geo_rings,
    q_geo_tiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qfn,sql",
    [
        (q_geo_distance, SQL_GEO_DISTANCE),
        (q_geo_bbox, SQL_GEO_BBOX),
        (q_geo_rings, SQL_GEO_RINGS),
        (q_geo_tiles, SQL_GEO_TILES),
    ],
    ids=["distance", "bbox", "rings", "tiles"],
)
def test_geo_matches_oracle(spark, duck, qfn, sql):
    got = _rows(qfn(spark, SF_DIR))
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want
    assert got, "vacuous geo case — query/derivation mismatch"


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278): ~343.5 km
    df = spark.range(1).select(
        haversine_m(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    )
    d = df.collect()[0]["d"]
    assert abs(d - 343_500) < 1_500, d


def test_bbox_never_excludes_a_true_match(spark):
    """The bbox prefilter must be a superset of the haversine disk:
    removing it can't change the result set."""
    df = geo_events(spark, SF_DIR)
    lat, lon, r = 10.0, 20.0, 1_500_000.0
    with_box = _rows(geo_distance_topk(df, lat, lon, r, k=10**6))
    dist = F.round(
        haversine_m(F.col("lat"), F.col("lon"), F.lit(lat), F.lit(lon)), 3
    )
    no_box = _rows(
        df.select("event_id", dist.alias("dist_m"))
        .filter(F.col("dist_m") <= r)
    )
    assert with_box == no_box


def test_bbox_pole_and_antimeridian_degrade_safely():
    assert bbox_around(89.0, 0.0, 500_000.0) == (-90.0, 90.0, -180.0, 180.0)
    lat_min, lat_max, lon_min, lon_max = bbox_around(0.0, 179.9, 500_000.0)
    assert (lon_min, lon_max) == (-180.0, 180.0)  # wrap: lon pruning off
    assert lat_min < 0.0 < lat_max
    # normal case: lon delta grows toward the pole edge of the box
    _, _, eq_lo, eq_hi = bbox_around(0.0, 0.0, 500_000.0)
    _, _, hi_lo, hi_hi = bbox_around(55.0, 0.0, 500_000.0)
    assert (hi_hi - hi_lo) > (eq_hi - eq_lo)
    # exact lat slab
    assert math.isclose(
        bbox_around(10.0, 20.0, 1_000_000.0)[1] - 10.0,
        math.degrees(1_000_000.0 / 6_371_000.0),
    )


def test_rings_partition_the_corpus(spark):
    df = q_geo_rings(spark, SF_DIR)
    rows = {int(r["ring"]): int(r["n"]) for r in df.collect()}
    total = geo_events(spark, SF_DIR).count()
    assert sum(rows.values()) == total  # every event lands in exactly one ring
    assert set(rows) <= {0, 1, 2, 3}


def test_tiles_are_in_range(spark):
    zoom_n = 1 << 4
    for r in q_geo_tiles(spark, SF_DIR).collect():
        assert 0 <= r["tile_x"] < zoom_n
        assert 0 <= r["tile_y"] < zoom_n


def test_geo_plan_is_jvm_side(spark):
    plan = (
        q_geo_distance(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
