"""Geo query entries (SURVEY §2.4 residual slice; reference client:
search_queries_geo_bounding_box.go, search_queries_geo_distance.go:16,
search_queries_geo_polygon.go:14, GeoDistanceSort in sort.go).

Coordinates are synthesized deterministically from doc_id (see
query/geo.py) because the webtext model has no geo columns; the math is
integer-exact so both engines see identical points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..query.geo import (
    LAT_SQL,
    geohash_sql,
    LON_SQL,
    bbox_pred,
    convex_polygon_pred,
    convex_polygon_sql,
    haversine_km,
    haversine_sql,
    lat_col,
    lon_col,
)
from ..registry import index_for

_R = 6

# fixtures: a box over the mid-Atlantic, a 1500 km disc around (10, 20),
# and a convex CCW diamond
BBOX = {"top": 30.0, "left": -40.0, "bottom": 10.0, "right": -10.0}
POINT = (10.0, 20.0)
RADIUS_KM = 1500.0
DIAMOND = [(10.0, 10.0), (0.0, 25.0), (10.0, 40.0), (20.0, 25.0)]


def _geo_docs(spark, sf_dir):
    return (
        index_for(spark, sf_dir)
        .docstore()
        .select("doc_id", lat_col().alias("lat"), lon_col().alias("lon"))
    )


def q_geo_bounding_box(spark, sf_dir):
    """geo_bounding_box: two range predicates over the point columns —
    on stored lat/lon these push into the parquet scan (row-group
    pruning), the cheapest geo filter there is."""
    d = _geo_docs(spark, sf_dir)
    out = d.where(
        bbox_pred(F.col("lat"), F.col("lon"), BBOX["top"], BBOX["left"], BBOX["bottom"], BBOX["right"])
    )
    return out.select("doc_id", F.round("lat", _R).alias("lat"), F.round("lon", _R).alias("lon")).orderBy("doc_id")


def q_geo_distance(spark, sf_dir):
    """geo_distance filter + GeoDistanceSort: haversine disc around a
    fixed point, nearest-first. One narrow projection + filter — no
    shuffle until the final top-k."""
    d = _geo_docs(spark, sf_dir)
    dist = F.round(haversine_km(F.col("lat"), F.col("lon"), POINT[0], POINT[1]), 4)
    out = d.select("doc_id", dist.alias("dist_km")).where(F.col("dist_km") < RADIUS_KM)
    return out.orderBy(F.asc("dist_km"), F.asc("doc_id")).limit(15)


def q_geo_polygon(spark, sf_dir):
    """geo_polygon (convex): same-side-of-every-edge cross-product
    containment — pure arithmetic, no trig, scan-pushable on stored
    columns."""
    d = _geo_docs(spark, sf_dir)
    out = d.where(convex_polygon_pred(F.col("lat"), F.col("lon"), DIAMOND))
    return out.select("doc_id", F.round("lat", _R).alias("lat"), F.round("lon", _R).alias("lon")).orderBy("doc_id")


def q_agg_geo_distance(spark, sf_dir):
    """geo_distance aggregation (search_aggs_bucket_geo_distance.go):
    distance-range buckets around the fixed point — the geo analogue of
    the range agg; one narrow projection + groupBy."""
    d = _geo_docs(spark, sf_dir)
    dist = F.round(haversine_km(F.col("lat"), F.col("lon"), POINT[0], POINT[1]), 4)
    bucket = (
        F.when(dist < 2000, "0-2000")
        .when(dist < 5000, "2000-5000")
        .when(dist < 10000, "5000-10000")
        .otherwise("10000+")
    )
    out = d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count")
    )
    return out.orderBy("bucket")


def q_agg_geo_bounds(spark, sf_dir):
    """geo_bounds metric (search_aggs_metrics_geo_bounds.go): the
    bounding box of all points matching a filter — min/max over the
    point columns, one partial-aggregated pass."""
    d = _geo_docs(spark, sf_dir).where(F.col("lat") > 0)
    return d.agg(
        F.round(F.max("lat"), 6).alias("top"),
        F.round(F.min("lat"), 6).alias("bottom"),
        F.round(F.min("lon"), 6).alias("left"),
        F.round(F.max("lon"), 6).alias("right"),
        F.count(F.lit(1)).cast("long").alias("doc_count"),
    )


GEOHASH_PRECISION = 2


def q_agg_geohash_grid(spark, sf_dir):
    """geohash_grid aggregation (search_aggs_bucket_geohash_grid.go):
    bucket docs by base32 geohash cell, top cells by count. The cell
    key is ONE arithmetic expression (query/geo.py geohash_sql —
    validated against canonical vectors), dialect-common so the oracle
    runs the identical formula; stays entirely in whole-stage codegen."""
    d = _geo_docs(spark, sf_dir)
    cell = F.expr(geohash_sql("lat", "lon", GEOHASH_PRECISION))
    out = d.select(cell.alias("geohash")).groupBy("geohash").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count")
    )
    return out.orderBy(F.desc("doc_count"), F.asc("geohash")).limit(10)


_HAV = haversine_sql(LAT_SQL, LON_SQL, POINT[0], POINT[1])

ENTRIES = {
    "geo_bounding_box": (
        q_geo_bounding_box,
        f"""WITH g AS (SELECT doc_id, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM documents)
SELECT doc_id, round(lat, {_R}) AS lat, round(lon, {_R}) AS lon FROM g
WHERE lat <= {BBOX['top']} AND lat >= {BBOX['bottom']}
  AND lon >= {BBOX['left']} AND lon <= {BBOX['right']}
ORDER BY doc_id""",
    ),
    "geo_distance": (
        q_geo_distance,
        f"""WITH g AS (SELECT doc_id, round({_HAV}, 4) AS dist_km FROM documents)
SELECT doc_id, dist_km FROM g WHERE dist_km < {RADIUS_KM}
ORDER BY dist_km ASC, doc_id ASC LIMIT 15""",
    ),
    "agg_geo_distance": (
        q_agg_geo_distance,
        f"""WITH g AS (SELECT round({_HAV}, 4) AS dist FROM documents)
SELECT CASE WHEN dist < 2000 THEN '0-2000' WHEN dist < 5000 THEN '2000-5000'
            WHEN dist < 10000 THEN '5000-10000' ELSE '10000+' END AS bucket,
       count(*) AS doc_count
FROM g GROUP BY 1 ORDER BY bucket""",
    ),
    "agg_geo_bounds": (
        q_agg_geo_bounds,
        f"""WITH g AS (SELECT doc_id, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM documents)
SELECT round(max(lat), 6) AS top, round(min(lat), 6) AS bottom,
       round(min(lon), 6) AS "left", round(max(lon), 6) AS "right",
       count(*) AS doc_count
FROM g WHERE lat > 0""",
    ),
    "agg_geohash_grid": (
        q_agg_geohash_grid,
        f"""WITH g AS (SELECT doc_id, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM documents)
SELECT {geohash_sql('lat', 'lon', GEOHASH_PRECISION)} AS geohash, count(*) AS doc_count
FROM g GROUP BY 1 ORDER BY doc_count DESC, geohash ASC LIMIT 10""",
    ),
    "geo_polygon": (
        q_geo_polygon,
        f"""WITH g AS (SELECT doc_id, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM documents)
SELECT doc_id, round(lat, {_R}) AS lat, round(lon, {_R}) AS lon FROM g
WHERE {convex_polygon_sql('lat', 'lon', DIAMOND)}
ORDER BY doc_id""",
    ),
}
