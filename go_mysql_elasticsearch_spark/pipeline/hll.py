"""Deterministic HyperLogLog — the approximate-cardinality sketch.

ES's `cardinality` aggregation is an HLL estimate, not a count
(search_aggs_metrics_cardinality.go:10 — `precision_threshold` tunes
the sketch); the repo's `agg_cardinality` entry is the exact twin. This
module adds the actual sketch, built so BOTH engines reproduce the
SAME estimate bit-for-bit (same md5 hash, same register math — the
determinism trick the LSH/random_score oracles use):

- hash: first 13 hex chars of md5(value) → 52-bit integer. 52 bits
  keeps every intermediate exactly representable in a float64, so
  ``floor(h / m)`` is exact in any engine (division by a power of two).
- m = 512 registers (p = 9): bucket = h % m, w = floor(h / m)
  (43 bits), rank = 43 - floorlog2(w) (w = 0 → 44). floorlog2 is a
  generated integer CASE chain — no floating log, no ulp divergence.
- estimate: alpha_m · m² / (zeros + Σ 2^−rank) with the standard
  linear-counting small-range correction. Final round(., 2) absorbs
  any last-ulp summation-order difference.

At scale this is the shape that matters: the register table is ≤ m
rows after one partial-agg groupBy — a 10^12-row column reduces to 512
registers map-side before the shuffle, which is the entire point of
sketching. Standard error ≈ 1.04/√m ≈ 4.6%.
"""

from __future__ import annotations

P = 9
M = 1 << P  # 512 registers
H_HEX = 13  # 52-bit hash: every intermediate float64-exact
W_BITS = 4 * H_HEX - P  # 43
ALPHA = 0.7213 / (1 + 1.079 / M)


def hash_sql(value_expr: str, dialect: str) -> str:
    """52-bit md5 hash of the value's string form. The only
    dialect-split piece (hex → int differs; the digest is identical)."""
    if dialect == "duckdb":
        return f"cast(('0x' || substr(md5(cast({value_expr} AS VARCHAR)), 1, {H_HEX})) AS BIGINT)"
    return f"cast(conv(substr(md5(cast({value_expr} AS STRING)), 1, {H_HEX}), 16, 10) AS BIGINT)"


def rank_sql(h_expr: str = "h") -> str:
    """rank = leading-zero count of w in a {W_BITS}-bit window + 1,
    as pure integer CASE arithmetic (exact in both engines)."""
    w = f"cast(floor({h_expr} / {M}.0) AS BIGINT)"
    branches = " ".join(
        f"WHEN {w} >= {1 << k} THEN {W_BITS - k}" for k in range(W_BITS - 1, -1, -1)
    )
    return f"(CASE {branches} ELSE {W_BITS + 1} END)"


def estimate_sql(value_expr: str, table: str, dialect: str) -> str:
    """Full one-row SELECT: (hll_estimate double). Identical math in
    both dialects; only the hash literal differs."""
    h = hash_sql(value_expr, dialect)
    return f"""WITH hv AS (SELECT {h} AS h FROM {table}),
reg AS (SELECT h % {M} AS bucket, max({rank_sql()}) AS mx FROM hv GROUP BY bucket),
acc AS (
  SELECT count(*) AS occ, sum(power(2.0, -mx)) AS s_occ FROM reg
),
est AS (
  SELECT ({M} - occ) AS zeros,
         cast({ALPHA} AS DOUBLE) * {M} * {M} / (({M} - occ) + s_occ) AS raw
  FROM acc
)
SELECT round(CASE WHEN raw <= {2.5 * M} AND zeros > 0
             THEN {M} * ln({M}.0 / zeros) ELSE raw END, 2) AS hll_estimate
FROM est"""


def estimate_df(df, value_col: str):
    """DataFrame form of the same sketch (Spark side): two tiny
    aggregations, all expressions shared with the SQL twin via
    F.expr of the generated fragments."""
    from pyspark.sql import functions as F

    hv = df.select(F.expr(hash_sql(value_col, "spark")).alias("h"))
    reg = (
        hv.withColumn("bucket", F.col("h") % M)
        .withColumn("rk", F.expr(rank_sql()))
        .groupBy("bucket")
        .agg(F.max("rk").alias("mx"))
    )
    acc = reg.agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s_occ"),
    )
    zeros = M - F.col("occ")
    raw = ALPHA * M * M / (zeros + F.col("s_occ"))
    est = F.when((raw <= 2.5 * M) & (zeros > 0), M * F.log(M / zeros)).otherwise(raw)
    return acc.select(F.round(est, 2).alias("hll_estimate"))
