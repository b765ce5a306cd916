"""Round 5b — the remaining ES geo surfaces (plans/geo.py): geo_centroid
(exact fixed-point integer sums), geo_bounds, geohash_grid (generated
bit-interleave + base32), geo_polygon (ray casting)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miru_spark.plans.geo import (
    _GH_PRECISION,
    _POLY,
    SQL_GEO_BOUNDS,
    SQL_GEO_CENTROID,
    SQL_GEO_GEOHASH,
    SQL_GEO_POLYGON,
    _geohash_pieces,
    geo_events,
    geo_polygon_agg,
    q_geo_bounds,
    q_geo_centroid,
    q_geo_geohash,
    q_geo_polygon,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qfn,sql",
    [
        (q_geo_centroid, SQL_GEO_CENTROID),
        (q_geo_bounds, SQL_GEO_BOUNDS),
        (q_geo_geohash, SQL_GEO_GEOHASH),
        (q_geo_polygon, SQL_GEO_POLYGON),
    ],
    ids=["centroid", "bounds", "geohash", "polygon"],
)
def test_geo_aggs_match_oracle(spark, duck, qfn, sql):
    got = _rows(qfn(spark, SF_DIR))
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want
    assert got, "vacuous geo case"


def test_centroid_inside_bounds(spark):
    cen = {r["event_type"]: r for r in q_geo_centroid(spark, SF_DIR).collect()}
    bnd = {r["event_type"]: r for r in q_geo_bounds(spark, SF_DIR).collect()}
    assert set(cen) == set(bnd)
    for et, c in cen.items():
        b = bnd[et]
        # quantization error is bounded by half a milli-degree
        assert b["min_lat"] - 1e-3 <= c["c_lat"] <= b["max_lat"] + 1e-3
        assert b["min_lon"] - 1e-3 <= c["c_lon"] <= b["max_lon"] + 1e-3
        assert c["n"] == b["n"]


def _gh(spark, lat, lon, precision):
    lonb, latb, h_of, chars_of = _geohash_pieces(precision, "spark")
    df = spark.createDataFrame([(lat, lon)], "lat double, lon double")
    st = df.selectExpr(f"{lonb} AS __lonb", f"{latb} AS __latb").selectExpr(
        f"({h_of('__lonb', '__latb')}) AS __h"
    )
    return st.selectExpr(f"{chars_of('__h')} AS gh").collect()[0]["gh"]


def test_geohash_known_values(spark):
    """Canonical encodings (the geohash.org reference point and corners)."""
    assert _gh(spark, 57.64911, 10.40744, 5) == "u4pru"
    assert _gh(spark, 57.64911, 10.40744, 3) == "u4p"
    # equator/prime-meridian cell: first char of (0,0) is 's'
    assert _gh(spark, 0.0, 0.0, 1) == "s"
    # extreme corners stay in range (clamp guard)
    assert len(_gh(spark, 90.0, 180.0, 3)) == 3


def test_geohash_prefix_nesting(spark):
    """precision-p hash of a point is a prefix of its precision-(p+1) hash
    — the property grid drill-down relies on."""
    pts = [(57.64911, 10.40744), (-33.8688, 151.2093), (40.7128, -74.006)]
    for lat, lon in pts:
        g3 = _gh(spark, lat, lon, 3)
        g5 = _gh(spark, lat, lon, 5)
        assert g5.startswith(g3)


def test_geohash_python_reference(spark):
    """Independent pure-Python geohash (textbook bisection algorithm, no
    shared code with the engine's bit-interleave) agrees."""

    def ref(lat, lon, precision):
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, out, even = [], [], True
        while len(out) < precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    bits.append(1)
                    lon_lo = mid
                else:
                    bits.append(0)
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    bits.append(1)
                    lat_lo = mid
                else:
                    bits.append(0)
                    lat_hi = mid
            even = not even
            if len(bits) == 5:
                out.append(alphabet[int("".join(map(str, bits)), 2)])
                bits = []
        return "".join(out)

    pts = [(12.345, -67.89), (-45.0, 0.001), (59.999, 179.5), (0.25, 0.25)]
    for lat, lon in pts:
        assert _gh(spark, lat, lon, 4) == ref(lat, lon, 4), (lat, lon)


def test_polygon_agrees_with_python_ray_cast(spark):
    """The generated SQL crossing predicate matches an independent Python
    ray cast over every event point."""

    def inside(lat, lon, poly):
        n, c = len(poly), False
        for i in range(n):
            (yi, xi), (yj, xj) = poly[i], poly[(i + 1) % n]
            if ((yi > lat) != (yj > lat)) and (
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
            ):
                c = not c
        return c

    pts = geo_events(spark, SF_DIR).select("lat", "lon").collect()
    exp = sum(1 for r in pts if inside(r["lat"], r["lon"], _POLY))
    got = (
        geo_polygon_agg(geo_events(spark, SF_DIR), _POLY)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert got == exp
    assert 0 < exp < len(pts)  # polygon genuinely splits the corpus


def test_polygon_plan_is_jvm_side(spark):
    plan = geo_polygon_agg(
        geo_events(spark, SF_DIR), _POLY
    )._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan
