"""Deterministic count-min sketch — approximate heavy-hitter counts.

The streaming/telemetry dual of the HLL sketch (pipeline/hll.py): ES
answers "top terms" with exact shard-local counts merged approximately
(search_aggs_bucket_terms.go doc_count_error_upper_bound is exactly
this error being surfaced); a web-scale pipeline wants the sketch
form — fixed memory regardless of cardinality. Same cross-engine
determinism trick as the HLL/LSH oracles: md5 row hashes, so Spark and
DuckDB build the IDENTICAL sketch and the gate hash-compares the
estimates.

Sketch: d=4 rows × w=1024 counters; hash_r(x) = first 13 hex chars of
md5('r:' || x) mod w (52-bit → float64-exact everywhere, same bound as
the HLL hash). estimate(x) = min over rows of counter[r][hash_r(x)] —
always ≥ the true count, over by at most ~(2/w)·N with prob 1−(1/2)^d.

Scale shape: ONE pass over the token stream emitting d (row, bucket)
pairs per token (explode of a 4-element array — no repeated scans),
then a groupBy whose result is ≤ d·w = 4096 rows: a 10^12-token corpus
reduces map-side to a 4096-cell table, which is the entire point.
Probe-term buckets are computed driver-side with hashlib (bit-identical
to the SQL md5) and broadcast."""

from __future__ import annotations

import hashlib

D = 4  # rows
W = 1024  # counters per row
H_HEX = 13  # 52-bit hash, float64-exact in every engine

PROBES = ["the", "data", "merge", "scan", "dup"]


def probe_bucket(row: int, term: str) -> int:
    h = hashlib.md5(f"{row}:{term}".encode()).hexdigest()[:H_HEX]
    return int(h, 16) % W


def _hash_mod_sql(value_expr: str, row: int, dialect: str) -> str:
    inp = f"('{row}:' || {value_expr})"
    if dialect == "duckdb":
        return f"(cast(('0x' || substr(md5({inp}), 1, {H_HEX})) AS BIGINT) % {W})"
    return f"(cast(conv(substr(md5({inp}), 1, {H_HEX}), 16, 10) AS BIGINT) % {W})"


def sketch_df(toks):
    """(r, bucket, c) sketch cells from a one-column ``term`` frame —
    one scan, d pairs per token via array-explode."""
    from pyspark.sql import functions as F

    pairs = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_hash_mod_sql("term", r, "spark")).alias("bucket"),
                    )
                    for r in range(D)
                ]
            )
        ).alias("p")
    ).select("p.r", "p.bucket")
    return pairs.groupBy("r", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))


def estimate_df(spark, toks, probes: list[str] | None = None):
    """(term, est, ...) — min-over-rows CMS estimate per probe term."""
    from pyspark.sql import functions as F

    probes = probes or PROBES
    sk = sketch_df(toks)
    pb = spark.createDataFrame(
        [(t, r, probe_bucket(r, t)) for t in probes for r in range(D)],
        "term string, r int, bucket int",
    )
    # broadcast the SKETCH (≤ d·w rows by construction) — the right
    # side of a left join is the broadcastable one
    return (
        pb.join(F.broadcast(sk), ["r", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )


def sketch_sql(toks_select: str, dialect: str) -> str:
    """SQL twin of sketch_df. The oracle may scan the (tiny) token CTE
    d times — oracle cost is irrelevant; the Spark side is the
    single-scan plan."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_hash_mod_sql('term', r, dialect)} AS bucket FROM toks"
        for r in range(D)
    )
    return f"WITH toks AS ({toks_select}),\npairs AS (\n{rows}\n),\nsk AS (SELECT r, bucket, count(*) AS c FROM pairs GROUP BY r, bucket)"


def estimate_sql(toks_select: str, dialect: str, probes: list[str] | None = None) -> str:
    probes = probes or PROBES
    vals = ", ".join(
        f"('{t}', {r}, {probe_bucket(r, t)})" for t in probes for r in range(D)
    )
    return f"""{sketch_sql(toks_select, dialect)},
pb(term, r, bucket) AS (VALUES {vals}),
est AS (
  SELECT pb.term, min(coalesce(sk.c, 0)) AS est
  FROM pb LEFT JOIN sk ON sk.r = pb.r AND sk.bucket = pb.bucket
  GROUP BY pb.term
)
SELECT term, cast(est AS BIGINT) AS est FROM est"""
