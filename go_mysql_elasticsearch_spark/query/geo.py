"""Geo query primitives (reference client surface:
vendor/gopkg.in/olivere/elastic.v3/search_queries_geo_bounding_box.go,
search_queries_geo_distance.go:16, search_queries_geo_polygon.go:14,
plus GeoDistanceSort in sort.go).

The webtext data model carries no geo columns, so the entries derive a
deterministic synthetic (lat, lon) per doc from integer arithmetic on
doc_id — exact in any engine, so the DuckDB oracle reproduces the
points bit-for-bit. On a real table these would be stored columns and
every predicate below pushes into the parquet scan (bounding box is two
range filters — the classic row-group pruning case).

Distance is great-circle haversine (km). All trig runs on the same
float64 inputs in both engines; results are rounded before comparison.
Polygon containment is implemented for CONVEX polygons as the
same-side-of-every-edge cross-product test — pure arithmetic, no trig,
exactly twinnable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

# deterministic synthetic coordinates: multiply-mod lattice over the
# doc id — integer-exact in Spark AND DuckDB, then one exact division
LAT_SQL = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
LON_SQL = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


def lat_col() -> F.Column:
    return (F.col("doc_id") * 7919 % 18000) / 100.0 - 90.0


def lon_col() -> F.Column:
    return (F.col("doc_id") * 104729 % 36000) / 100.0 - 180.0


def haversine_km(lat, lon, lat2: float, lon2: float) -> F.Column:
    """Great-circle distance (km) from a fixed point — the
    geo_distance filter/sort kernel (search_queries_geo_distance.go:16)."""
    rlat1, rlat2 = F.radians(lat), F.radians(F.lit(float(lat2)))
    dlat = F.radians(F.lit(float(lat2)) - lat)
    dlon = F.radians(F.lit(float(lon2)) - lon)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def haversine_sql(lat_expr: str, lon_expr: str, lat2: float, lon2: float) -> str:
    """The identical computation as a DuckDB SQL fragment."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians({lat2} - ({lat_expr})) / 2), 2) + "
        f"cos(radians({lat_expr})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - ({lon_expr})) / 2), 2)))"
    )


def bbox_pred(lat, lon, top: float, left: float, bottom: float, right: float) -> F.Column:
    """geo_bounding_box (search_queries_geo_bounding_box.go): two range
    predicates — pushes to the scan when lat/lon are stored columns."""
    return (lat <= top) & (lat >= bottom) & (lon >= left) & (lon <= right)


def convex_polygon_pred(lat, lon, points: list[tuple[float, float]]) -> F.Column:
    """geo_polygon (search_queries_geo_polygon.go:14) for a CONVEX
    counter-clockwise polygon: inside iff the point is on the left of
    every directed edge (cross product >= 0). Pure arithmetic — the
    DuckDB twin is the same inequalities."""
    pred = F.lit(True)
    n = len(points)
    for i in range(n):
        (y1, x1), (y2, x2) = points[i], points[(i + 1) % n]
        cross = (F.lit(x2 - x1)) * (lat - F.lit(y1)) - (F.lit(y2 - y1)) * (lon - F.lit(x1))
        pred = pred & (cross >= 0)
    return pred


def convex_polygon_sql(lat_expr: str, lon_expr: str, points: list[tuple[float, float]]) -> str:
    n = len(points)
    conds = []
    for i in range(n):
        (y1, x1), (y2, x2) = points[i], points[(i + 1) % n]
        conds.append(
            f"(({x2} - {x1}) * (({lat_expr}) - {y1}) - ({y2} - {y1}) * (({lon_expr}) - {x1})) >= 0"
        )
    return " AND ".join(conds)


B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """Base32 geohash of a point as a SQL expression valid in BOTH
    Spark SQL and DuckDB (search_aggs_bucket_geohash_grid.go — the grid
    agg's cell key). Bit interleaving unrolled to pure integer
    arithmetic: bit n of x = CASE WHEN x % 2^(n+1) >= 2^n THEN 1 END —
    no dialect-specific functions, so the oracle runs the IDENTICAL
    expression. Validated against the canonical test vectors
    (u4p/u4pru for 57.64911, 10.40744)."""
    total = 5 * precision
    nlon, nlat = (total + 1) // 2, total // 2
    ix = f"least(cast(floor((({lon_expr}) + 180.0) / 360.0 * {1 << nlon}) AS BIGINT), {(1 << nlon) - 1})"
    iy = f"least(cast(floor((({lat_expr}) + 90.0) / 180.0 * {1 << nlat}) AS BIGINT), {(1 << nlat) - 1})"

    def bit(x: str, n: int) -> str:
        return f"(CASE WHEN ({x}) % {1 << (n + 1)} >= {1 << n} THEN 1 ELSE 0 END)"

    terms = []
    for k in range(total):
        if k % 2 == 0:
            b = bit("__ix", nlon - 1 - k // 2)
        else:
            b = bit("__iy", nlat - 1 - k // 2)
        terms.append(f"{b} * {1 << (total - 1 - k)}")
    v = " + ".join(terms)
    v = f"({v})"
    # explicit floor(): DuckDB's int->int cast ROUNDS while Spark's
    # truncates — floor is the dialect-common truncation
    chars = [
        f"substr('{B32}', cast(floor(({v}) / {1 << (5 * (precision - 1 - i))}.0) AS BIGINT) % 32 + 1, 1)"
        for i in range(precision)
    ]
    expr = " || ".join(chars)
    # inline ix/iy (no lateral aliases — keeps it a single expression)
    return expr.replace("__ix", ix).replace("__iy", iy)
