"""Cross-batch streaming deduplication — the CDC-ingest guard the
reference implicitly relies on ES upserts for (same ``_id`` overwrites,
river/sync.go), made an explicit stream operator: drop re-deliveries
of the same content no matter which micro-batch they arrive in.

- :func:`dedup_events` — batch twin: first-seen row per dedup key
  (content hash), deterministic winner (min ts, then min event_id).
  SQL-expressible, oracle-gated.
- :func:`dedup_events_stream` — streaming: ``withWatermark`` +
  ``dropDuplicatesWithinWatermark`` — Structured Streaming keeps one
  state entry per key and EVICTS it once the watermark passes, so
  state is bounded by keys-per-watermark-window, not stream length
  (the only shape that survives an unbounded CDC tail). A duplicate
  arriving within the watermark window is dropped even across
  micro-batch boundaries; tests assert cross-batch drops and
  batch==stream output on in-order data.

Scale notes: the dedup key is a 60-bit md5 hash → uniform state
partitioning; no shuffle carries event payloads beyond the first
occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import h60


def _keyed(events: DataFrame) -> DataFrame:
    # value folded to integer cents before keying: double→string repr
    # is the one thing the two engines could print differently
    v100 = F.round(F.col("value") * 100).cast("long")
    key = h60(F.concat_ws("|", F.col("event_type"), F.col("user_id"), v100))
    return events.withColumn("dkey", key)


def dedup_events(events: DataFrame) -> DataFrame:
    """Batch twin: one row per dedup key — the FIRST occurrence by
    (ts, event_id) — plus the duplicate count folded away."""
    from pyspark.sql import Window

    w = Window.partitionBy("dkey").orderBy(F.asc("ts"), F.asc("event_id"))
    k = _keyed(events)
    return (
        k.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dupes", F.count(F.lit(1)).over(Window.partitionBy("dkey")) - 1)
        .where(F.col("rn") == 1)
        .select("event_id", "dkey", F.col("n_dupes").cast("long").alias("n_dupes"))
    )


def dedup_events_oracle_sql(table: str = "events") -> str:
    h = ("cast(('0x' || substr(md5(event_type || '|' || user_id::VARCHAR || '|' || "
         "cast(round(value * 100) AS BIGINT)::VARCHAR), 1, 15)) AS BIGINT)")
    return f"""WITH k AS (SELECT event_id, ts, {h} AS dkey FROM {table}),
r AS (
  SELECT event_id, dkey,
         row_number() OVER (PARTITION BY dkey ORDER BY ts ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY dkey) - 1 AS n_dupes
  FROM k
)
SELECT event_id, dkey, n_dupes::BIGINT AS n_dupes FROM r WHERE rn = 1"""


def dedup_events_stream(src: DataFrame, late: str = "30 minutes") -> DataFrame:
    """Streaming path: watermark on event time, then
    ``dropDuplicatesWithinWatermark`` on the content key — duplicates
    within the watermark horizon are dropped ACROSS micro-batches with
    state that evicts itself as the watermark advances."""
    return _keyed(src).withWatermark("ts", late).dropDuplicatesWithinWatermark(["dkey"])
