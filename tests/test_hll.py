"""Deterministic HLL sketch (pipeline/hll.py): estimate accuracy and
the cross-engine-exactness properties the oracle gate relies on."""

import duckdb
import pytest

from go_mysql_elasticsearch_spark.pipeline.hll import (
    M,
    estimate_sql,
    hash_sql,
    rank_sql,
)


@pytest.mark.parametrize("n", [1000, 10_000, 100_000])
def test_estimate_within_stderr_envelope(n):
    """Standard error for m=512 is ~4.6%; allow 3σ (14%)."""
    q = estimate_sql("i", f"(SELECT unnest(range({n})) AS i)", "duckdb")
    est = duckdb.sql(q).fetchone()[0]
    assert abs(est - n) / n < 0.14, (n, est)


def test_small_range_linear_counting():
    """Tiny cardinalities take the linear-counting branch and land
    very close to exact."""
    q = estimate_sql("i", "(SELECT unnest(range(50)) AS i)", "duckdb")
    est = duckdb.sql(q).fetchone()[0]
    assert abs(est - 50) <= 3, est


def test_duplicates_do_not_inflate():
    """HLL is a set sketch: 100x-duplicated values give the same
    estimate as the distinct set."""
    base = "(SELECT (i % 200) AS i FROM (SELECT unnest(range(20000)) AS i))"
    dedup = "(SELECT unnest(range(200)) AS i)"
    e1 = duckdb.sql(estimate_sql("i", base, "duckdb")).fetchone()[0]
    e2 = duckdb.sql(estimate_sql("i", dedup, "duckdb")).fetchone()[0]
    assert e1 == e2


def test_hash_is_52_bit_and_register_math_exact():
    """Every intermediate must stay float64-exact: h < 2^52, and
    floor(h / m) recombines with h % m to h (division by a power of
    two is exact)."""
    rows = duckdb.sql(
        f"""SELECT {hash_sql('i', 'duckdb')} AS h
        FROM (SELECT unnest(range(1000)) AS i)"""
    ).fetchall()
    for (h,) in rows:
        assert 0 <= h < (1 << 52)
        assert (h // M) * M + (h % M) == int(h / M) * M + (h % M) == h - 0  # exact


def test_spark_and_duckdb_hash_fragments_agree(spark):
    """The dialect-split hash fragments produce identical integers for
    identical inputs (same md5, different hex→int spelling)."""
    from pyspark.sql import functions as F

    vals = list(range(500))
    df = spark.createDataFrame([(v,) for v in vals], "i long")
    got_spark = sorted(
        r["h"] for r in df.select(F.expr(hash_sql("i", "spark")).alias("h")).collect()
    )
    got_duck = sorted(
        h
        for (h,) in duckdb.sql(
            f"SELECT {hash_sql('i', 'duckdb')} AS h FROM (SELECT unnest(range(500)) AS i)"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_rank_sql_boundaries():
    """rank = leading zeros in the 43-bit w window + 1; spot-check the
    extremes through the generated CASE chain."""
    # w = 2^42 (top bit set) → rank 1; w = 1 → rank 43; w = 0 → rank 44
    for h, want in [((1 << 42) * M, 1), (1 * M, 43), (0, 44)]:
        got = duckdb.sql(f"SELECT {rank_sql(str(h))}").fetchone()[0]
        assert got == want, (h, want, got)
