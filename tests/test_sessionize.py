"""Stateful streaming sessionization == batch sessionization.

The streaming path (applyInPandasWithState) must produce exactly the
sessions the batch window-function path produces, across micro-batch
boundaries (state carries the open session between batches)."""

import json

from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.streaming.sessionize import sessionize, sessionize_stream

EVENTS = [
    # user 1: two sessions (gap 3600s between event 2 and 3)
    (1, "2024-01-01 10:00:00"),
    (1, "2024-01-01 10:10:00"),
    (1, "2024-01-01 12:00:00"),
    (1, "2024-01-01 12:05:00"),
    # user 2: one session then a lone event far later
    (2, "2024-01-01 09:00:00"),
    (2, "2024-01-01 09:20:00"),
    (2, "2024-01-02 09:00:00"),
]
# sentinel events close every open session so the streaming (append-
# mode) output covers the full real session set
SENTINELS = [(1, "2024-06-01 00:00:00"), (2, "2024-06-01 00:00:00")]


def _batch_sessions(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    return {
        (r["user_id"], r["session_id"], r["n_events"], str(r["t_start"]), str(r["t_end"]))
        for r in sessionize(df, gap_sec=1800).collect()
    }


def test_batch_sessionize_shape(spark):
    got = _batch_sessions(spark, EVENTS)
    assert (1, 0, 2, "2024-01-01 10:00:00", "2024-01-01 10:10:00") in got
    assert (1, 1, 2, "2024-01-01 12:00:00", "2024-01-01 12:05:00") in got
    assert (2, 1, 1, "2024-01-02 09:00:00", "2024-01-02 09:00:00") in got
    assert len(got) == 4


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    """Events split over two files (two micro-batches, mid-session
    split for user 1) + sentinel batch → streaming sessions equal the
    batch result."""
    import os
    import time

    src = tmp_path / "sess_src"
    src.mkdir()
    batches = [EVENTS[:3], EVENTS[3:], SENTINELS]
    now = int(time.time())
    for i, b in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for u, t in b:
                f.write(json.dumps({"user_id": u, "ts_s": t}) + "\n")
        # FileStreamSource orders batches by mtime; same-second writes
        # tie and replay out of order — pin strictly increasing mtimes
        # (the operator, like any log consumer, assumes per-key arrival
        # order; binlog/kafka give it by construction)
        os.utime(p, (now + i, now + i))
    stream = (
        spark.readStream.schema("user_id long, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_id"], r["n_events"], str(r["t_start"]), str(r["t_end"]))
        for r in spark.read.parquet(out_dir).collect()
    }
    want = _batch_sessions(spark, EVENTS)  # sentinels close, don't appear
    assert got == want
