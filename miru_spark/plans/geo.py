"""Geo queries & aggregations — the ES/Lucene geo family (round 5).

Covers the four shapes a search user actually issues (ES `geo_distance`
query, `geo_bounding_box` query, `geo_distance` aggregation,
`geotile_grid` aggregation — Lucene's LatLonPoint + ShapeDocValues
family), each as a pure codegen DataFrame plan with a 1:1 DuckDB twin.

Coordinates: the sandbox testdata carries no geo columns, so a
deterministic geo_point is DERIVED from ``event_id`` with two Lehmer-style
integer hashes (pure ``*``/``+``/``%`` on non-negative BIGINTs — bit-
identical in Spark and DuckDB, the same cross-engine-determinism
discipline as pipeline/sampling.py's md5 draws). lat lands in [-60, 60)
(away from the mercator/haversine pole degeneracies), lon in [-180, 180).
Every operator takes the (lat, lon) COLUMNS, so a production corpus with
physical geo_point columns swaps in without touching the operators.

Scale shape (the 100-TB lens):

* ``geo_distance`` applies the cheap BOUNDING-BOX prefilter first — four
  lat/lon range predicates. On physical columns those are ordinary range
  filters that push down to the parquet scan (row-group pruning on
  min/max stats; at petabyte scale the table would be laid out
  z-order/geo-partitioned so the bbox prunes FILES). Only bbox survivors
  pay the haversine trig. The bbox is widened by the exact lat radius and
  the lon radius at the box edge closest to the pole (cos shrinks lon
  degrees away from the equator), so it can never exclude a true match.
* Both aggregations are single map-side-combined hash aggs over pure
  arithmetic keys: ring index from one haversine per row, geotile ids
  from the web-mercator formulas — no geohash base32 string assembly, no
  UDF, no shuffle beyond the one the agg needs.

Haversine (meters, sphere R=6371000): the standard
``2 R asin(sqrt(sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlam/2)))``.
Both engines evaluate it in IEEE double with ~1-ulp transcendentals;
outputs are rounded to 1e-3 m (grid >> 1e-9 m accumulated error), same
margin discipline as the BM25 score rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EARTH_R_M = 6_371_000.0

# Lehmer-style derivation constants (pinned; Park-Miller multipliers)
_M = 2_147_483_647
_LAT_A, _LAT_B = 48_271, 11
_LON_A, _LON_B = 16_807, 7


def derived_point(key: Column) -> tuple[Column, Column]:
    """Deterministic (lat, lon) from a non-negative BIGINT key — identical
    in Spark and DuckDB because it is pure integer ``*``/``+``/``%`` and
    one division at the end."""
    lat = (
        ((key * _LAT_A + _LAT_B) % _M % 120_000) / 1_000.0 - 60.0
    )
    lon = (
        ((key * _LON_A + _LON_B) % _M % 360_000) / 1_000.0 - 180.0
    )
    return lat, lon


DERIVED_POINT_SQL = (
    "((({k} * 48271 + 11) % 2147483647) % 120000) / 1000.0 - 60.0",
    "((({k} * 16807 + 7) % 2147483647) % 360000) / 1000.0 - 180.0",
)


def geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + derived (lat, lon) — the shared input frame."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    lat, lon = derived_point(F.col("event_id"))
    return e.select(
        "event_id", "event_type", "value",
        lat.alias("lat"), lon.alias("lon"),
    )


GEO_EVENTS_SQL = (
    "SELECT event_id, event_type, value, "
    + DERIVED_POINT_SQL[0].format(k="event_id")
    + " AS lat, "
    + DERIVED_POINT_SQL[1].format(k="event_id")
    + " AS lon FROM events"
)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters, pure codegen built-ins."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp, dl = F.radians(lat2 - lat1), F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dp / 2), 2)
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    )
    return 2.0 * EARTH_R_M * F.asin(F.sqrt(a))


def _haversine_sql(lat1: str, lon1: str, lat2: float, lon2: float) -> str:
    return (
        f"2.0 * {EARTH_R_M!r} * asin(sqrt("
        f"pow(sin(radians({lat2!r} - {lat1}) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2!r})) * "
        f"pow(sin(radians({lon2!r} - {lon1}) / 2), 2)))"
    )


def bbox_around(
    lat: float, lon: float, radius_m: float
) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) guaranteed to contain the
    radius_m disk around (lat, lon): the lat delta is exact; the lon delta
    uses cos at the box edge CLOSEST to the pole, where meridians are
    tightest, so the box can only over-include. Boxes reaching a pole or
    wrapping the antimeridian degrade to the full lat/lon range (correct,
    just unpruned — the exact haversine filter still runs after)."""
    dlat = math.degrees(radius_m / EARTH_R_M)
    lat_min, lat_max = lat - dlat, lat + dlat
    if lat_min <= -90.0 or lat_max >= 90.0:
        return -90.0, 90.0, -180.0, 180.0
    worst = max(abs(lat_min), abs(lat_max))
    dlon = math.degrees(radius_m / (EARTH_R_M * math.cos(math.radians(worst))))
    if dlon >= 180.0:
        return lat_min, lat_max, -180.0, 180.0
    if lon - dlon < -180.0 or lon + dlon > 180.0:
        # antimeridian wrap: keep the lat slab, give up lon pruning
        return lat_min, lat_max, -180.0, 180.0
    return lat_min, lat_max, lon - dlon, lon + dlon


def geo_distance_topk(
    df: DataFrame,
    lat: float,
    lon: float,
    radius_m: float,
    k: int = 50,
    round_digits: int = 3,
) -> DataFrame:
    """ES geo_distance query + geo-distance sort: rows within radius_m of
    (lat, lon), nearest first (ties by event_id), with the bbox prefilter
    in front of the exact haversine."""
    lat_min, lat_max, lon_min, lon_max = bbox_around(lat, lon, radius_m)
    dist = haversine_m(F.col("lat"), F.col("lon"), F.lit(lat), F.lit(lon))
    return (
        df.filter(
            (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max)
            & (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
        )
        .select(
            "event_id", F.round(dist, round_digits).alias("dist_m")
        )
        .filter(F.col("dist_m") <= radius_m)
        .orderBy(F.asc("dist_m"), F.asc("event_id"))
        .limit(k)
    )


def geo_distance_topk_sql(
    lat: float, lon: float, radius_m: float, k: int = 50,
    round_digits: int = 3,
) -> str:
    lat_min, lat_max, lon_min, lon_max = bbox_around(lat, lon, radius_m)
    d = _haversine_sql("lat", "lon", lat, lon)
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT event_id, round({d}, {round_digits}) AS dist_m FROM g
WHERE lat >= {lat_min!r} AND lat <= {lat_max!r}
  AND lon >= {lon_min!r} AND lon <= {lon_max!r}
  AND round({d}, {round_digits}) <= {radius_m!r}
ORDER BY dist_m, event_id LIMIT {k}
""".strip()


def geo_bbox_agg(
    df: DataFrame,
    lat_min: float, lat_max: float, lon_min: float, lon_max: float,
) -> DataFrame:
    """ES geo_bounding_box query, aggregated per event_type (the filter IS
    the operator; the agg makes it value-checkable without emitting every
    row)."""
    return (
        df.filter(
            (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max)
            & (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def geo_bbox_agg_sql(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float
) -> str:
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value FROM g
WHERE lat >= {lat_min!r} AND lat <= {lat_max!r}
  AND lon >= {lon_min!r} AND lon <= {lon_max!r}
GROUP BY event_type ORDER BY event_type
""".strip()


def geo_distance_rings(
    df: DataFrame, lat: float, lon: float, edges_m: list[float]
) -> DataFrame:
    """ES geo_distance aggregation: ring buckets [0, e1), [e1, e2), ...,
    [e_last, inf) around the origin — ring index + count. One haversine
    per row, one hash agg."""
    dist = haversine_m(F.col("lat"), F.col("lon"), F.lit(lat), F.lit(lon))
    # ring index = how many edges the distance has passed (0 = innermost)
    ring = sum(
        ((dist >= F.lit(e)).cast("long") for e in edges_m), F.lit(0).cast("long")
    )
    return (
        df.select(ring.alias("ring"))
        .groupBy("ring")
        .agg(F.count("*").alias("n"))
        .orderBy("ring")
    )


def geo_distance_rings_sql(
    lat: float, lon: float, edges_m: list[float]
) -> str:
    d = _haversine_sql("lat", "lon", lat, lon)
    ring = " + ".join(
        f"CASE WHEN {d} >= {e!r} THEN 1 ELSE 0 END" for e in edges_m
    )
    ring = f"CAST({ring} AS BIGINT)"
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT ({ring}) AS ring, count(*) AS n FROM g
GROUP BY 1 ORDER BY ring
""".strip()


def geotile_cols(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """Web-mercator tile ids at ``zoom`` (ES geotile_grid keys are
    "z/x/y"): pure arithmetic, no base32 geohash strings."""
    n = float(1 << zoom)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    phi = F.radians(lat)
    y = F.floor(
        (1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi) / 2.0 * n
    ).cast("long")
    return x, y


def geotile_grid(df: DataFrame, zoom: int, size: int = 20) -> DataFrame:
    """ES geotile_grid aggregation: top ``size`` tiles by doc count
    (ties by tile id), one map-side-combined hash agg."""
    x, y = geotile_cols(F.col("lat"), F.col("lon"), zoom)
    return (
        df.select(x.alias("tile_x"), y.alias("tile_y"))
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tile_x"), F.asc("tile_y"))
        .limit(size)
    )


def geotile_grid_sql(zoom: int, size: int = 20) -> str:
    n = float(1 << zoom)
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS tile_x,
       CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / {math.pi!r}) / 2.0 * {n!r}) AS BIGINT) AS tile_y,
       count(*) AS n
FROM g GROUP BY 1, 2 ORDER BY n DESC, tile_x, tile_y LIMIT {size}
""".strip()


def geo_centroid(
    df: DataFrame, by: str = "event_type", quant: float = 1000.0
) -> DataFrame:
    """ES ``geo_centroid`` aggregation: per-bucket arithmetic-mean point.

    Discipline: coordinates are quantized to fixed-point integers
    (``quant=1000`` = 1e-3 degrees ~ 111 m) BEFORE summation, so the agg
    accumulates exact longs and the centroid is partition-merge-order
    independent — the float-sum version would drift with partitioning. ES
    itself does the same thing: geo_points are stored as encoded int32
    lat/lon and its centroid sums those integers."""
    qlat = F.round(F.col("lat") * quant).cast("long")
    qlon = F.round(F.col("lon") * quant).cast("long")
    n = F.col("n").cast("double")
    return (
        df.groupBy(by)
        .agg(
            F.count("*").alias("n"),
            F.sum(qlat).alias("slat"),
            F.sum(qlon).alias("slon"),
        )
        .select(
            by,
            "n",
            F.round(F.col("slat") / n / quant, 6).alias("c_lat"),
            F.round(F.col("slon") / n / quant, 6).alias("c_lon"),
        )
        .orderBy(by)
    )


def geo_centroid_sql(by: str = "event_type", quant: float = 1000.0) -> str:
    return f"""
WITH g AS ({GEO_EVENTS_SQL}),
s AS (SELECT {by}, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(lat * {quant!r}) AS BIGINT)) AS BIGINT) AS slat,
             CAST(sum(CAST(round(lon * {quant!r}) AS BIGINT)) AS BIGINT) AS slon
      FROM g GROUP BY 1)
SELECT {by}, n,
       round(slat / CAST(n AS DOUBLE) / {quant!r}, 6) AS c_lat,
       round(slon / CAST(n AS DOUBLE) / {quant!r}, 6) AS c_lon
FROM s ORDER BY {by}
""".strip()


def geo_bounds(df: DataFrame, by: str = "event_type") -> DataFrame:
    """ES ``geo_bounds`` aggregation: the tightest box containing each
    bucket's points (top_left = (max_lat, min_lon), bottom_right =
    (min_lat, max_lon)); min/max are exact on doubles, one hash agg."""
    return (
        df.groupBy(by)
        .agg(
            F.count("*").alias("n"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
            F.min("lon").alias("min_lon"),
            F.max("lon").alias("max_lon"),
        )
        .orderBy(by)
    )


def geo_bounds_sql(by: str = "event_type") -> str:
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT {by}, CAST(count(*) AS BIGINT) AS n,
       min(lat) AS min_lat, max(lat) AS max_lat,
       min(lon) AS min_lon, max(lon) AS max_lon
FROM g GROUP BY 1 ORDER BY {by}
""".strip()


# geohash base32 alphabet (the standard one — no a, i, l, o)
_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_pieces(precision: int, engine: str):
    """(lonb_sql, latb_sql, h_sql(lonb,latb), char_sqls(h)) — kept as
    composable pieces because neither engine loves deeply nested scalar
    subqueries in a GROUP BY key."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2

    def shl(x: str, k: int) -> str:
        if k == 0:
            return x
        return (
            f"shiftleft({x}, {k})" if engine == "spark" else f"({x} << {k})"
        )

    def shr(x: str, k: int) -> str:
        if k == 0:
            return x
        return (
            f"shiftright({x}, {k})" if engine == "spark" else f"({x} >> {k})"
        )

    lonb = (
        f"least(CAST(floor((lon + 180.0) / 360.0 * {float(1 << nlon)!r}) "
        f"AS BIGINT), {(1 << nlon) - 1})"
    )
    latb = (
        f"least(CAST(floor((lat + 90.0) / 180.0 * {float(1 << nlat)!r}) "
        f"AS BIGINT), {(1 << nlat) - 1})"
    )

    def h_of(lonb_col: str, latb_col: str) -> str:
        terms = []
        for k in range(nbits):
            if k % 2 == 0:
                src, j = lonb_col, nlon - 1 - k // 2
            else:
                src, j = latb_col, nlat - 1 - (k - 1) // 2
            terms.append(shl(f"({shr(src, j)} & 1)", nbits - 1 - k))
        return " + ".join(terms)

    def chars_of(h_col: str) -> str:
        chars = [
            f"substr('{_GH32}', CAST(({shr(h_col, 5 * (precision - 1 - c))}"
            f" & 31) AS INTEGER) + 1, 1)"
            for c in range(precision)
        ]
        return "concat(" + ", ".join(chars) + ")"

    return lonb, latb, h_of, chars_of


def geohash_grid(df: DataFrame, precision: int = 3, size: int = 20) -> DataFrame:
    """ES ``geohash_grid`` aggregation: top ``size`` geohash cells by doc
    count (ties by hash). The geohash is computed as generated integer
    bit-interleave arithmetic + base32 substr — all codegen built-ins, no
    UDF; the DuckDB twin is generated from the same pieces, so the
    encoding cannot drift between engines."""
    lonb, latb, h_of, chars_of = _geohash_pieces(precision, "spark")
    staged = df.selectExpr(f"{lonb} AS __lonb", f"{latb} AS __latb")
    staged = staged.selectExpr(f"({h_of('__lonb', '__latb')}) AS __h")
    return (
        staged.selectExpr(f"{chars_of('__h')} AS gh")
        .groupBy("gh")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gh"))
        .limit(size)
    )


def geohash_grid_sql(precision: int = 3, size: int = 20) -> str:
    lonb, latb, h_of, chars_of = _geohash_pieces(precision, "duck")
    return f"""
WITH g AS ({GEO_EVENTS_SQL}),
b AS (SELECT {lonb} AS lonb, {latb} AS latb FROM g),
h AS (SELECT ({h_of('lonb', 'latb')}) AS h FROM b)
SELECT {chars_of('h')} AS gh, count(*) AS n
FROM h GROUP BY 1 ORDER BY n DESC, gh LIMIT {size}
""".strip()


def _polygon_crossings(vertices, y: str, x: str) -> list[str]:
    """Ray-casting edge predicates (shared text for both engines): edge
    (i, j) crosses the horizontal ray from (x, y) iff the edge spans y and
    the intersection lies right of x."""
    preds = []
    n = len(vertices)
    for i in range(n):
        (yi, xi), (yj, xj) = vertices[i], vertices[(i + 1) % n]
        preds.append(
            f"CASE WHEN (({yi!r} > {y}) <> ({yj!r} > {y})) AND "
            f"({x} < ({xj!r} - {xi!r}) * ({y} - {yi!r}) / ({yj!r} - {yi!r})"
            f" + {xi!r}) THEN 1 ELSE 0 END"
        )
    return preds


def geo_polygon_agg(df: DataFrame, vertices) -> DataFrame:
    """ES ``geo_polygon`` query (aggregated per event_type to stay
    value-checkable): point-in-polygon by ray casting — odd number of
    edge crossings = inside. The predicate is pure generated arithmetic
    (identical text drives the twin), evaluated once per row; on physical
    geo columns the polygon's bounding box would be ANDed in front as a
    pushed-down range prefilter, same pattern as geo_distance."""
    crossings = " + ".join(_polygon_crossings(vertices, "lat", "lon"))
    return (
        df.where(F.expr(f"(({crossings}) % 2) = 1"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def geo_polygon_agg_sql(vertices) -> str:
    crossings = " + ".join(_polygon_crossings(vertices, "lat", "lon"))
    return f"""
WITH g AS ({GEO_EVENTS_SQL})
SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM g WHERE (({crossings}) % 2) = 1
GROUP BY event_type ORDER BY event_type
""".strip()


# ---------------------------------------------------------------------------
# driver registry cases (members of the rel_scalar_funcs composite)

_Q_LAT, _Q_LON, _Q_RADIUS = 10.0, 20.0, 1_500_000.0
_BBOX = (-10.0, 25.0, 0.0, 40.0)
_RING_EDGES = [2_000_000.0, 5_000_000.0, 10_000_000.0]
_ZOOM = 4


def q_geo_distance(spark: SparkSession, sf: str) -> DataFrame:
    return geo_distance_topk(geo_events(spark, sf), _Q_LAT, _Q_LON, _Q_RADIUS)


SQL_GEO_DISTANCE = geo_distance_topk_sql(_Q_LAT, _Q_LON, _Q_RADIUS)


def q_geo_bbox(spark: SparkSession, sf: str) -> DataFrame:
    return geo_bbox_agg(geo_events(spark, sf), *_BBOX)


SQL_GEO_BBOX = geo_bbox_agg_sql(*_BBOX)


def q_geo_rings(spark: SparkSession, sf: str) -> DataFrame:
    return geo_distance_rings(geo_events(spark, sf), _Q_LAT, _Q_LON, _RING_EDGES)


SQL_GEO_RINGS = geo_distance_rings_sql(_Q_LAT, _Q_LON, _RING_EDGES)


def q_geo_tiles(spark: SparkSession, sf: str) -> DataFrame:
    return geotile_grid(geo_events(spark, sf), _ZOOM)


SQL_GEO_TILES = geotile_grid_sql(_ZOOM)

_GH_PRECISION = 3
# pentagon roughly covering the populated lat/lon range; vertex
# coordinates carry a .0005 offset so no data point (3-decimal grid) ever
# lies exactly on a vertex latitude (ray-casting degeneracy guard)
_POLY = [
    (40.0005, -30.0005), (40.0005, 30.0005), (0.0005, 45.0005),
    (-20.0005, 0.0005), (0.0005, -45.0005),
]


def q_geo_centroid(spark: SparkSession, sf: str) -> DataFrame:
    return geo_centroid(geo_events(spark, sf))


SQL_GEO_CENTROID = geo_centroid_sql()


def q_geo_bounds(spark: SparkSession, sf: str) -> DataFrame:
    return geo_bounds(geo_events(spark, sf))


SQL_GEO_BOUNDS = geo_bounds_sql()


def q_geo_geohash(spark: SparkSession, sf: str) -> DataFrame:
    return geohash_grid(geo_events(spark, sf), _GH_PRECISION)


SQL_GEO_GEOHASH = geohash_grid_sql(_GH_PRECISION)


def q_geo_polygon(spark: SparkSession, sf: str) -> DataFrame:
    return geo_polygon_agg(geo_events(spark, sf), _POLY)


SQL_GEO_POLYGON = geo_polygon_agg_sql(_POLY)
