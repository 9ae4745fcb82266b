"""Geo primitives (query/geo.py): the dialect-common geohash expression
must reproduce the canonical test vectors, and the Spark + DuckDB
evaluations of the same expression must agree."""

import duckdb
import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.query.geo import geohash_sql, haversine_km


CANONICAL = [
    (57.64911, 10.40744, 3, "u4p"),
    (57.64911, 10.40744, 5, "u4pru"),
    (-25.382708, -49.265506, 6, "6gkzwg"),
]


@pytest.mark.parametrize("lat,lon,prec,want", CANONICAL)
def test_geohash_sql_canonical_vectors_duckdb(lat, lon, prec, want):
    e = geohash_sql(str(lat), str(lon), prec)
    assert duckdb.sql(f"SELECT {e}").fetchone()[0] == want


def test_geohash_sql_same_in_spark_and_duckdb(spark):
    pts = [(57.64911, 10.40744), (-25.382708, -49.265506), (0.0, 0.0), (89.99, 179.99), (-89.99, -179.99)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    e = geohash_sql("lat", "lon", 4)
    got_spark = [r[0] for r in df.select(F.expr(e)).collect()]
    got_duck = [duckdb.sql(f"SELECT {geohash_sql(str(a), str(b), 4)}").fetchone()[0] for a, b in pts]
    assert got_spark == got_duck


def test_haversine_known_distance(spark):
    # Paris -> London ~ 343-344 km great-circle
    df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
    d = df.select(haversine_km(F.col("lat"), F.col("lon"), 51.5074, -0.1278).alias("km")).first()["km"]
    assert 340 < d < 348
