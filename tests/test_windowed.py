"""Watermarked windowed aggregation (streaming/windowed.py): the
streaming path must equal the batch twin on in-order data, and must
DROP late events that arrive behind the watermark (append-mode
finalized windows never change)."""

import json
import os
import time

from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.streaming.windowed import (
    windowed_counts,
    windowed_counts_stream,
)

# window = 1 hour, watermark lateness = 30 minutes
IN_ORDER = [
    # W0 [10:00, 11:00)
    ("click", "2024-01-01 10:05:00", 1.0),
    ("view", "2024-01-01 10:10:00", 2.0),
    ("click", "2024-01-01 10:40:00", 3.0),
    # W2 [12:00, 13:00) — advances max event time well past W0+late
    ("click", "2024-01-01 12:45:00", 4.0),
]
SECOND_BATCH = [
    # W3 [13:00, 14:00)
    ("view", "2024-01-01 13:30:00", 5.0),
]
ADVANCE = [
    # advances the stream one batch so W0's state is EVICTED (emitted)
    # at this batch's end — watermark 12:45-0:30 = 12:15 > 11:00
    ("view", "2024-01-01 13:40:00", 6.0),
]
STRAGGLER = [
    # W0 again — arrives AFTER W0 was finalized; Spark's guarantee is
    # eviction-scoped: a late row whose window state is already gone is
    # dropped (numRowsDroppedByWatermark). A late row landing in the
    # SAME batch as the eviction may still merge — which is why this
    # arrives one batch after ADVANCE.
    ("click", "2024-01-01 10:20:00", 100.0),
]
# two sentinel batches: the first advances max event time far ahead,
# the second gives the engine one more micro-batch in which the
# advanced watermark evicts (emits) every real window
SENTINEL_1 = [("s", "2024-06-01 00:00:00", 0.0)]
SENTINEL_2 = [("s", "2024-06-01 00:01:00", 0.0)]


def _write_batches(tmp_path, name, batches):
    src = tmp_path / name
    src.mkdir()
    now = int(time.time())
    for i, b in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for et, ts, v in b:
                f.write(json.dumps({"event_type": et, "ts_s": ts, "value": v}) + "\n")
        # FileStreamSource orders by mtime; pin strictly increasing
        os.utime(p, (now + i, now + i))
    return str(src)


def _run_stream(spark, tmp_path, src_dir, tag):
    stream = (
        spark.readStream.schema("event_type string, ts_s string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    )
    out_dir, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
    q = (
        windowed_counts_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (str(r["w_start"]), r["event_type"], r["n"], r["v"])
        for r in spark.read.parquet(out_dir).collect()
        if r["w_start"].year < 2024 or r["w_start"].month < 6  # drop sentinel windows
    }


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    return {
        (str(r["w_start"]), r["event_type"], r["n"], r["v"])
        for r in windowed_counts(df).collect()
    }


def test_stream_equals_batch_in_order(spark, tmp_path):
    src = _write_batches(
        tmp_path, "w_src1", [IN_ORDER, SECOND_BATCH, SENTINEL_1, SENTINEL_2]
    )
    got = _run_stream(spark, tmp_path, src, "a")
    want = _batch(spark, IN_ORDER + SECOND_BATCH)
    assert got == want


def test_late_event_dropped_by_watermark(spark, tmp_path):
    """The straggler lands in a window the watermark already passed:
    streaming (append) keeps the finalized window, the batch twin
    counts the straggler — the sets must differ in exactly that
    window."""
    src = _write_batches(
        tmp_path, "w_src2", [IN_ORDER, ADVANCE, STRAGGLER, SENTINEL_1, SENTINEL_2]
    )
    got = _run_stream(spark, tmp_path, src, "b")
    # streaming == batch over the events WITHOUT the late straggler
    want_no_late = _batch(spark, IN_ORDER + ADVANCE)
    assert got == want_no_late
    # and the batch twin WITH the straggler disagrees on W0 click
    want_with_late = _batch(spark, IN_ORDER + ADVANCE + STRAGGLER)
    assert got != want_with_late
    w0_click_stream = {t for t in got if t[0] == "2024-01-01 10:00:00" and t[1] == "click"}
    w0_click_batch = {
        t for t in want_with_late if t[0] == "2024-01-01 10:00:00" and t[1] == "click"
    }
    assert w0_click_stream == {("2024-01-01 10:00:00", "click", 2, 4.0)}
    assert w0_click_batch == {("2024-01-01 10:00:00", "click", 3, 104.0)}
