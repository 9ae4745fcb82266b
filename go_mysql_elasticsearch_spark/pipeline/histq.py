"""Deterministic histogram quantile sketch — the third of the sketch
trio (HLL cardinality, count-min heavy hitters, histogram quantiles).

ES's `percentiles` agg is a t-digest; t-digest centroids depend on
input order, which breaks cross-engine value-hash gating. An
equi-width histogram is the order-independent, mergeable alternative
with the same streaming shape: fixed memory (n_bins counters), ONE
pass, map-side partial aggregation (the per-bin count is a plain
Catalyst groupBy-sum), and bin-merge = vector add — exactly what a
1000-executor percentile estimate needs. Estimation error is bounded
by the bin width (range / n_bins), the standard accuracy/memory trade.

Quantile convention (mirrored bit-for-bit in the DuckDB twin): for
quantile q over N values, target rank r = q·N; walk the cumulative
bin counts to the first bin with cum ≥ r; linearly interpolate inside
the bin: est = lo + width · (r − cum_before) / bin_count.

The domain [lo, hi] comes from an initial exact min/max aggregation —
a cheap columnar single-column pass (Spark only serves min/max from
parquet footer metadata when ``spark.sql.parquet.aggregatePushDown``
is enabled AND the input is a bare scan; this session does not set it,
so count the pass honestly).

Degenerate inputs (empty table / all-NULL column) yield one row of
NULL estimates — identical to the DuckDB twin, whose correlated
subqueries over an empty histogram return NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 256


def hist_quantiles(
    df: DataFrame, col: str, qs: list[float], n_bins: int = N_BINS
) -> DataFrame:
    """One row: est_q<q> per requested quantile, from an n_bins
    equi-width histogram over [min, max]."""
    spark = df.sparkSession
    names = [f"est_q{str(q).replace('.', '_')}" for q in qs]
    schema = ", ".join(f"{k} double" for k in names)
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or hi is None:
        # empty table / all-NULL column: one row of NULLs, matching the
        # SQL twin's empty-histogram subqueries
        return spark.createDataFrame([tuple(None for _ in names)], schema)
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / n_bins or 1.0
    # bin index, clamped so x == hi lands in the last bin
    bin_col = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(n_bins - 1)
    )
    hist = (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_col.alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .orderBy("b")
        .collect()
    )
    counts = {r["b"]: r["c"] for r in hist}
    n = sum(counts.values())
    outs = []
    for q in qs:
        r = q * n
        cum = 0
        est = None  # no-bin-found => NULL, matching the SQL twin
        for b in range(n_bins):
            c = counts.get(b, 0)
            if c and cum + c >= r:
                frac = (r - cum) / c
                est = round(lo + width * (b + frac), 6)
                break
            cum += c
        outs.append(est)
    return spark.createDataFrame([tuple(outs)], schema)


def hist_quantiles_sql(
    col: str, qs: list[float], table: str = "events", n_bins: int = N_BINS
) -> str:
    """DuckDB twin: identical bins, identical rank walk, identical
    interpolation arithmetic."""
    sels = []
    for q in qs:
        name = f"est_q{str(q).replace('.', '_')}"
        sels.append(
            f"""round((SELECT lo + width * (b + ({q} * n - cb) / c) FROM (
      SELECT b, c, sum(c) OVER (ORDER BY b) - c AS cb FROM hist
    ), d WHERE cb + c >= {q} * n ORDER BY b LIMIT 1), 6) AS {name}"""
        )
    return f"""WITH mm AS (
  SELECT min({col})::DOUBLE AS lo, max({col})::DOUBLE AS hi,
         count({col})::DOUBLE AS n FROM {table}
),
d AS (
  SELECT lo, hi, n,
         CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / {n_bins} END AS width
  FROM mm
),
hist AS (
  SELECT least(floor(({col} - lo) / width)::INT, {n_bins - 1}) AS b,
         count(*)::BIGINT AS c
  FROM {table}, d WHERE {col} IS NOT NULL GROUP BY 1
)
SELECT {', '.join(sels)} FROM d"""
