"""Count-min sketch (pipeline/cms.py): overestimate-only guarantee,
error bound, and cross-engine hash agreement."""

import duckdb

from go_mysql_elasticsearch_spark.pipeline.cms import (
    D,
    W,
    estimate_sql,
    probe_bucket,
    _hash_mod_sql,
)


def _toks(n_each: dict) -> str:
    parts = []
    for t, n in n_each.items():
        parts.append(f"SELECT '{t}' AS term FROM range({n})")
    return " UNION ALL ".join(parts)


def test_cms_never_underestimates_and_bounds_error():
    counts = {"alpha": 500, "beta": 40, "gamma": 3}
    filler = " UNION ALL SELECT 'f' || (i % 300) AS term FROM (SELECT unnest(range(3000)) AS i)"
    q = estimate_sql(_toks(counts) + filler, "duckdb", probes=list(counts))
    got = dict(duckdb.sql(q).fetchall())
    n_total = sum(counts.values()) + 3000
    for t, true in counts.items():
        assert got[t] >= true, (t, got[t], true)  # CMS never under
        assert got[t] - true <= (2 / W) * n_total * 4, (t, got[t], true)


def test_absent_term_estimates_near_zero():
    q = estimate_sql(_toks({"alpha": 100}), "duckdb", probes=["zzznope"])
    (row,) = duckdb.sql(q).fetchall()
    assert row[1] <= 2


def test_probe_bucket_matches_sql_hash(spark):
    """hashlib-computed probe buckets == both engines' md5 fragments."""
    from pyspark.sql import functions as F

    for r in range(D):
        for t in ["the", "data", "zq9"]:
            lit = "'" + t + "'"
            duck = duckdb.sql(
                "SELECT " + _hash_mod_sql(lit, r, "duckdb")
            ).fetchone()[0]
            sp = spark.range(1).select(
                F.expr(_hash_mod_sql(lit, r, "spark")).alias("b")
            ).collect()[0]["b"]
            assert probe_bucket(r, t) == duck == sp
