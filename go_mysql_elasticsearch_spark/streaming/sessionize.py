"""Sessionization — the custom stateful-streaming operator.

The reference's only stream state is the binlog position (SURVEY §2.6);
this module adds the stateful operator a training-data pipeline over
event streams actually needs: group events into per-user sessions split
at inactivity gaps.

Two implementations with IDENTICAL output (asserted in
tests/test_sessionize.py):

- :func:`sessionize` — batch, pure Catalyst window functions
  (lag → gap flag → running sum = session index → groupBy). This is
  the oracle-gated shape (SQL-expressible) and the backfill path.
- :func:`sessionize_stream` — Structured Streaming
  ``applyInPandasWithState``: per-user GroupState carries
  (session_start, last_ts, n_events); a batch's events merge in
  timestamp order, closing a session whenever the gap exceeds
  ``gap_sec``. Closed sessions emit downstream; the open session stays
  in state across micro-batches. This is the live path — state is
  bounded by (active users × one tuple), not by history. Like any log
  consumer it assumes per-key arrival order across micro-batches
  (binlog/kafka give this by construction; the file-source test pins
  mtimes to replay in order).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_id int, n_events long, t_start timestamp, t_end timestamp"
)
_STATE_SCHEMA = "start long, last long, n long, sid int"


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    user's previous event exceeds ``gap_sec``. session_id is 0-based
    per user in time order."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # double cast: TIMESTAMP_NTZ parquet columns reach epoch seconds via
    # LTZ (session tz is pinned UTC, so the hop is faithful)
    ep = F.col("ts").cast("timestamp").cast("long")
    gap = ep - F.lag(ep).over(w)
    flagged = events.select("user_id", "ts").withColumn(
        "new_s", F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    )
    sid = F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    sess = flagged.withColumn("session_id", sid.cast("int"))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
    )


def sessionize_oracle_sql(gap_sec: int = 1800, table: str = "events") -> str:
    """DuckDB twin of :func:`sessionize` (timestamps formatted for
    hash-stable comparison is the caller's concern)."""
    return f"""WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > {gap_sec} THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1)::INT AS session_id
  FROM g
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       min(ts) AS t_start, max(ts) AS t_end
FROM s GROUP BY user_id, session_id"""


def _apply_session_batch(key, pdfs: Iterable[pd.DataFrame], state, gap_sec: int):
    """Per-user state handler: merge the batch's events in ts order,
    emit sessions closed by a gap, keep the open session in state."""
    (user_id,) = key
    ts = pd.concat(list(pdfs))["ts"].sort_values()
    # unit-agnostic epoch seconds (Arrow may hand pandas ns OR us datetimes)
    epochs = [int(x) for x in (ts - pd.Timestamp(0)).dt.total_seconds()]
    if state.exists:
        start, last, n, sid = state.get
    else:
        start = last = None
        n, sid = 0, -1
    out: list[tuple[Any, ...]] = []
    for e, t in zip(epochs, ts):
        if last is None or e - last > gap_sec:
            if last is not None:
                out.append((user_id, sid, n, pd.Timestamp(start, unit="s"),
                            pd.Timestamp(last, unit="s")))
            sid += 1
            start, n = e, 0
        n += 1
        last = e
    state.update((start, last, n, sid))
    if not out:
        return iter(())
    return iter([pd.DataFrame(out, columns=["user_id", "session_id", "n_events", "t_start", "t_end"])])


def sessionize_stream(events_stream: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState (append mode:
    a session row emits once, when a later event closes it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def handler(key, pdfs, state):
        return _apply_session_batch(key, pdfs, state, gap_sec)

    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            handler,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
