"""Watermarked windowed aggregation over the event stream.

The reference's streaming surface is the binlog tail (canal/sync.go) —
it has no analytical stream operators; a training-data pipeline over
event streams needs them. This module is the canonical Structured-
Streaming shape: event-time tumbling windows + watermark, with a batch
twin for backfill/oracle.

- :func:`windowed_counts` — batch: ``F.window`` tumbling buckets per
  event_type. SQL-expressible (epoch-floor arithmetic), oracle-gated.
- :func:`windowed_counts_stream` — streaming: ``withWatermark`` +
  the same ``F.window`` groupBy in APPEND mode: a window only emits
  once the watermark passes its end, and events arriving later than
  ``late_sec`` behind the max seen event time are DROPPED — bounded
  state (open windows × event_types), the only shape that survives an
  unbounded stream. Batch == stream on in-order data is asserted in
  tests/test_windowed.py, as is the late-drop divergence (the batch
  twin counts the straggler, append-mode streaming does not).

Scale notes: the groupBy key is (window, event_type) — state and
shuffle are bounded by windows × types, never by events; partial
aggregation happens map-side before the shuffle like any Catalyst agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "1 hour"

OUT_SCHEMA = "w_start timestamp, w_end timestamp, event_type string, n long, v double"


def _agg(df: DataFrame, window: str) -> DataFrame:
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("v"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "v",
        )
    )


def windowed_counts(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """Batch twin: tumbling event-time windows per event_type."""
    return _agg(events.select("ts", "event_type", "value"), window)


def windowed_counts_oracle_sql(table: str = "events", window_sec: int = 3600) -> str:
    """DuckDB twin: F.window's tumbling bucket IS epoch-floor
    arithmetic — to_timestamp(floor(epoch(ts)/W)*W)."""
    return f"""SELECT to_timestamp(floor(epoch(ts) / {window_sec}) * {window_sec}) AS w_start,
       to_timestamp(floor(epoch(ts) / {window_sec}) * {window_sec} + {window_sec}) AS w_end,
       event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS v
FROM {table} GROUP BY 1, 2, 3"""


def windowed_counts_stream(
    src: DataFrame,
    window: str = WINDOW,
    late: str = "30 minutes",
) -> DataFrame:
    """Streaming path: watermark → the SAME windowed agg. Caller wires
    the sink with outputMode("append").

    Append mode + watermark = each window row is emitted EXACTLY ONCE,
    when the watermark (max event time − ``late``) passes the window
    end; events arriving behind the watermark are DROPPED, which bounds
    state forever — the property that matters on an unbounded binlog/
    event stream. Because emission waits on the watermark, a window
    closed by the final events of a bounded replay needs one more
    micro-batch to flush (tests append sentinel batches for this)."""
    return _agg(src.withWatermark("ts", late), window)
