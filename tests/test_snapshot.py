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
