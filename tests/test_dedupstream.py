"""Cross-batch streaming dedup (streaming/dedupstream.py): duplicates
arriving in LATER micro-batches must be dropped while the key's state
lives (within the watermark horizon), and the streaming survivor set
must equal the batch twin's keys on in-order data."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.streaming.dedupstream import (
    dedup_events,
    dedup_events_stream,
)


@pytest.fixture(scope="module")
def spark():
    from go_mysql_elasticsearch_spark.session import get_spark

    return get_spark(app_name="test-dedupstream")


# (event_id, ts, user_id, event_type, value)
BATCH_1 = [
    (0, "2024-01-01 10:00:00", 1, "click", 1.0),
    (1, "2024-01-01 10:01:00", 2, "view", 2.0),
]
BATCH_2 = [
    # exact content duplicate of event 0, DIFFERENT micro-batch —
    # must be dropped by cross-batch state
    (2, "2024-01-01 10:02:00", 1, "click", 1.0),
    (3, "2024-01-01 10:03:00", 3, "error", 3.0),
]
BATCH_3 = [
    # another duplicate of the same key, still within the horizon
    (4, "2024-01-01 10:04:00", 1, "click", 1.0),
    (5, "2024-01-01 10:05:00", 4, "view", 4.0),
]


def _write_batches(tmp_path, batches):
    src = tmp_path / "src"
    src.mkdir()
    now = int(time.time())
    for i, b in enumerate(batches):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for eid, ts, uid, et, v in b:
                f.write(json.dumps(
                    {"event_id": eid, "ts_s": ts, "user_id": uid,
                     "event_type": et, "value": v}) + "\n")
        os.utime(p, (now + i, now + i))
    return str(src)


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    src_dir = _write_batches(tmp_path, [BATCH_1, BATCH_2, BATCH_3])
    stream = (
        spark.readStream.schema(
            "event_id long, ts_s string, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        dedup_events_stream(stream)
        .select("event_id", "dkey")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    ids = sorted(r["event_id"] for r in got.collect())
    # events 2 and 4 are content-duplicates of 0 arriving in later
    # micro-batches — cross-batch state must drop them
    assert ids == [0, 1, 3, 5]

    # streaming survivor keys == batch twin keys
    rows = [r for b in (BATCH_1, BATCH_2, BATCH_3) for r in b]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")
    twin = dedup_events(batch)
    assert sorted(r["event_id"] for r in twin.collect()) == [0, 1, 3, 5]
    assert {r["dkey"] for r in twin.collect()} == {r["dkey"] for r in got.collect()}
    dupes = {r["event_id"]: r["n_dupes"] for r in twin.collect()}
    assert dupes[0] == 2  # events 2 and 4 folded into event 0
