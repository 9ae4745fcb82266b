"""Snapshot/restore: the pinned view survives later mutations of the
source index, and restore refuses partial snapshots."""

import os

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.index.snapshot import (
    SNAP_MANIFEST,
    restore_index,
    snapshot_index,
)
from go_mysql_elasticsearch_spark.query.wand import bm25_topk
from go_mysql_elasticsearch_spark.streaming.incremental import apply_changes

from .conftest import SF_SMALL


def _top(spark, idx_dir, terms):
    r = IndexReader(spark, idx_dir)
    return [(x["doc_id"], x["score"]) for x in bm25_topk(spark, r, terms, k=10).collect()]


def test_snapshot_restore_pins_the_view(spark, tmp_path):
    idx = str(tmp_path / "src_idx")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, idx, n_segments=1, n_shards=2)
    before = _top(spark, idx, ["data", "merge"])

    snap = str(tmp_path / "snap1")
    m = snapshot_index(idx, snap)
    assert m["segments"] and os.path.exists(os.path.join(snap, SNAP_MANIFEST))

    # mutate the source AFTER the snapshot: delete the top hit and add
    # a spam doc stuffed with the query terms
    top_doc = before[0][0]
    changes = spark.createDataFrame(
        [("delete", top_doc, None), ("insert", 10**7, "data merge " * 50)],
        "action string, doc_id long, text string",
    )
    apply_changes(spark, idx, changes, n_shards=2)
    mutated = _top(spark, idx, ["data", "merge"])
    assert mutated != before  # mutation visible on the live index

    # restored snapshot serves the exact pinned view
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    assert _top(spark, dest, ["data", "merge"]) == before

    # snapshots are immutable; partial snapshots refuse to restore
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(idx, snap)
    bad = str(tmp_path / "snap_partial")
    os.makedirs(bad)
    with pytest.raises(ValueError, match="no committed snapshot"):
        restore_index(bad, str(tmp_path / "nope"))


def test_snapshot_keeps_tombstone_when_replacement_merged_away(spark, tmp_path):
    """Code-review r5 finding: an upsert tombstone whose replacement
    segment was later MERGED AWAY (its id no longer pinned, its content
    inside a pinned merged segment) must be copied — dropping it would
    resurrect the old version beside the new one in the restore."""
    from go_mysql_elasticsearch_spark.streaming.incremental import merge_segments

    idx = str(tmp_path / "merge_snap_idx")
    docs = spark.createDataFrame(
        [(0, "alpha keep"), (1, "beta keep"), (2, "gamma keep")],
        "doc_id long, text string",
    )
    build_index(spark, docs, idx, n_segments=2, n_shards=1)
    # upsert doc 0: tombstone (0, upto=1), replacement in seg 2
    apply_changes(
        spark,
        idx,
        spark.createDataFrame([("update", 0, "alpha replaced")],
                              "action string, doc_id long, text string"),
        n_shards=1,
    )
    # merge the replacement's segment away: content moves to a NEW id
    reader = IndexReader(spark, idx)
    ids = [m["segment_id"] for m in reader.manifests][:2]
    merge_segments(spark, idx, ids, n_shards=1)

    snap = str(tmp_path / "merge_snap")
    snapshot_index(idx, snap)
    dest = str(tmp_path / "merge_restored")
    restore_index(snap, dest)
    rows = IndexReader(spark, dest).docstore().select("doc_id", "text").collect()
    assert len(rows) == 3  # no resurrected duplicate of doc 0
    assert {r["doc_id"]: r["text"] for r in rows}[0] == "alpha replaced"


def test_snapshot_concurrent_upsert_race_keeps_live_doc(spark, tmp_path):
    """ADVICE r4 (medium): a tombstone captured WITHOUT its replacement
    segment must not kill the doc in the restored index. Simulated by
    appending an orphan upsert tombstone (is_delete=false, replacement
    segment never committed) — exactly the on-disk state a snapshot
    racing apply_changes between its two writes would see — while a
    genuine delete tombstone (is_delete=true) must survive the copy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_mysql_elasticsearch_spark.index.build import gen_root

    idx = str(tmp_path / "race_idx")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, idx, n_segments=1, n_shards=2)
    before = _top(spark, idx, ["data", "merge"])
    live_doc = before[0][0]
    deleted_doc = before[1][0]

    # a real committed delete (replacement-less, is_delete=true)
    changes = spark.createDataFrame(
        [("delete", deleted_doc, None)], "action string, doc_id long, text string"
    )
    apply_changes(spark, idx, changes, n_shards=2)

    # orphan upsert tombstone: apply_changes crashed (or is mid-flight)
    # after the tombstone write, before the segment commit
    tdir = os.path.join(gen_root(idx), "tombstones.parquet")
    os.makedirs(tdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([live_doc], pa.int64()),
                "upto_seg": pa.array([999], pa.int32()),
                "is_delete": pa.array([False]),
            }
        ),
        os.path.join(tdir, "orphan.parquet"),
    )

    snap = str(tmp_path / "race_snap")
    snapshot_index(idx, snap)
    dest = str(tmp_path / "race_restored")
    restore_index(snap, dest)
    restored_ids = {d for d, _ in _top(spark, dest, ["data", "merge"])}
    assert live_doc in restored_ids  # orphan tombstone filtered out
    assert deleted_doc not in restored_ids  # committed delete honored


def test_snapshot_copies_legacy_tombstones_unfiltered(spark, tmp_path):
    """ADVICE r5 (medium): a LEGACY tombstone file (pre-is_delete
    schema) holding a delete-only row that targets the NEWEST segment
    must survive the snapshot unfiltered — the committed-replacement
    rule would have read it as an uncommitted upsert and dropped it,
    resurrecting the deleted doc in the restore."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_mysql_elasticsearch_spark.index.build import gen_root

    idx = str(tmp_path / "legacy_idx")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, idx, n_segments=1, n_shards=2)
    before = _top(spark, idx, ["data", "merge"])
    victim = before[0][0]

    # legacy-format delete: only (doc_id, upto_seg), upto_seg = newest
    # pinned segment (0) — replacement would be seg 1, uncommitted
    tdir = os.path.join(gen_root(idx), "tombstones.parquet")
    os.makedirs(tdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([victim], pa.int64()),
                "upto_seg": pa.array([0], pa.int32()),
            }
        ),
        os.path.join(tdir, "legacy.parquet"),
    )
    assert victim not in {d for d, _ in _top(spark, idx, ["data", "merge"])}

    snap = str(tmp_path / "legacy_snap")
    snapshot_index(idx, snap)
    dest = str(tmp_path / "legacy_restored")
    restore_index(snap, dest)
    restored_ids = {d for d, _ in _top(spark, dest, ["data", "merge"])}
    assert victim not in restored_ids  # legacy delete survives the copy
