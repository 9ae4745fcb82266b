"""Tiered partial segment merge (streaming/incremental.py
merge_segments): query-identical before/after, tombstone interplay,
and crash safety via manifest supersession."""

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query.wand import bm25_topk
from go_mysql_elasticsearch_spark.streaming.incremental import (
    apply_changes,
    gc_superseded_segments,
    merge_segments,
)

from .conftest import SF_SMALL


def _base_docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", F.concat(F.lit("u"), "doc_id").alias("url"), "lang", "text")
    )


@pytest.fixture()
def idx3(spark, tmp_path):
    d = str(tmp_path / "m_idx")
    build_index(spark, _base_docs(spark), d, n_segments=3, n_shards=2)
    return d


def _hits(spark, idx, terms, k=1000):
    return [
        (r["doc_id"], r["score"])
        for r in bm25_topk(spark, IndexReader(spark, idx), terms, k=k).collect()
    ]


def test_merge_preserves_queries_and_docs(spark, idx3):
    before_q = _hits(spark, idx3, ["data", "merge"])
    before_docs = IndexReader(spark, idx3).docstore().count()

    m = merge_segments(spark, idx3, [0, 1], n_shards=2)
    assert m["merged_from"] == ["0", "1"]

    r = IndexReader(spark, idx3)
    assert sorted(str(x["segment_id"]) for x in r.manifests) == ["2", "3"]
    assert r.docstore().count() == before_docs
    assert _hits(spark, idx3, ["data", "merge"]) == before_q


def test_merge_after_update_keeps_new_version(spark, idx3):
    """Upsert doc 0 (lands in a fresh CDC segment + tombstone), then
    merge the tombstone-carrying old tier: the updated version must
    stay the only visible one."""
    ch = spark.createDataFrame(
        [(0, "u0", "en", "zzzmerged content only")],
        "doc_id long, url string, lang string, text string",
    ).withColumn("action", F.lit("update"))
    apply_changes(spark, idx3, ch, n_shards=2)

    merge_segments(spark, idx3, [0, 1], n_shards=2)
    r = IndexReader(spark, idx3)
    live = r.docstore().where(F.col("doc_id") == 0).select("text").collect()
    assert len(live) == 1 and live[0]["text"] == "zzzmerged content only"
    assert [d for d, _ in _hits(spark, idx3, ["zzzmerged"])] == [0]


def test_crash_before_gc_is_invisible_to_readers(spark, idx3):
    """Simulated crash: merged manifest landed, old dirs not yet
    removed — the reader must supersede the old segments (no duplicate
    docs), and the next GC reclaims the dirs."""
    before_docs = IndexReader(spark, idx3).docstore().count()
    before_q = _hits(spark, idx3, ["data"])

    merge_segments(spark, idx3, [0, 1], n_shards=2, _skip_gc=True)  # "crash" here
    r = IndexReader(spark, idx3)
    assert sorted(str(x["segment_id"]) for x in r.manifests) == ["2", "3"]
    assert r.docstore().count() == before_docs
    assert _hits(spark, idx3, ["data"]) == before_q

    removed = gc_superseded_segments(idx3)
    assert len(removed) == 2
    assert IndexReader(spark, idx3).docstore().count() == before_docs


def test_merge_rejects_bad_ids(spark, idx3):
    with pytest.raises(ValueError, match="at least one"):
        merge_segments(spark, idx3, [])
    with pytest.raises(ValueError, match="unknown/superseded"):
        merge_segments(spark, idx3, [0, 99])
    merge_segments(spark, idx3, [0, 1], n_shards=2)
    with pytest.raises(ValueError, match="unknown/superseded"):
        merge_segments(spark, idx3, [0, 2])  # 0 already superseded

def test_plan_tiered_merge_policy():
    """Pure policy arithmetic: small-tier segments group by
    merge_factor, big segments stay untouched."""
    from go_mysql_elasticsearch_spark.streaming.incremental import plan_tiered_merge

    mk = lambda i, n: {"segment_id": str(i), "n_docs": n}
    # 5 tiny + 1 big: one group of 4 tiny, leftover tiny + big untouched
    manifests = [mk(i, 100 + i) for i in range(5)] + [mk(9, 500_000)]
    plans = plan_tiered_merge(manifests, merge_factor=4, tier_base=10_000)
    assert plans == [["0", "1", "2", "3"]]
    # 8 tiny -> two groups of 4
    plans = plan_tiered_merge([mk(i, 50) for i in range(8)], merge_factor=4)
    assert len(plans) == 2 and all(len(g) == 4 for g in plans)
    # under threshold -> nothing
    assert plan_tiered_merge([mk(i, 50) for i in range(3)], merge_factor=4) == []


def test_run_tiered_merges_end_to_end(spark, tmp_path):
    """8 tiny CDC-ish segments merge down to 2; queries identical."""
    from go_mysql_elasticsearch_spark.streaming.incremental import run_tiered_merges

    d = str(tmp_path / "tier_idx")
    build_index(spark, _base_docs(spark), d, n_segments=8, n_shards=2)
    before = _hits(spark, d, ["data", "merge"])
    merged = run_tiered_merges(spark, d, merge_factor=4, n_shards=2)
    assert len(merged) == 2
    r = IndexReader(spark, d)
    assert len(r.manifests) == 2
    assert _hits(spark, d, ["data", "merge"]) == before


def test_gc_retention_window_protects_draining_readers(spark, idx3):
    """With a retention window, a just-merged tier's old dirs survive
    GC (in-flight pre-merge readers keep their files); with the window
    elapsed (0), they are reclaimed."""
    merge_segments(spark, idx3, [0, 1], n_shards=2, _skip_gc=True)
    kept = gc_superseded_segments(idx3, retain_sec=3600)
    assert kept == []  # merge is seconds old -> nothing removed
    import os

    assert os.path.exists(os.path.join(idx3, "segments", "seg=0"))
    removed = gc_superseded_segments(idx3, retain_sec=0)
    assert len(removed) == 2


def test_compact_deferred_gc(spark, idx3):
    """compact(gc_old=False) leaves the pre-compact view on disk for
    draining readers; gc_old_generations reclaims it after the
    retention window (and never touches the live generation)."""
    import os

    from go_mysql_elasticsearch_spark.streaming.incremental import (
        compact,
        gc_old_generations,
    )

    before = _hits(spark, idx3, ["data"])
    compact(spark, idx3, n_segments=1, n_shards=2, gc_old=False)
    # old root layout still present (drain window), new gen serves
    assert os.path.isdir(os.path.join(idx3, "segments"))
    assert _hits(spark, idx3, ["data"]) == before
    assert gc_old_generations(idx3, retain_sec=3600) == []  # too fresh
    removed = gc_old_generations(idx3, retain_sec=0)
    assert removed, "old layout should be reclaimed"
    assert not os.path.isdir(os.path.join(idx3, "segments"))
    assert _hits(spark, idx3, ["data"]) == before  # live gen untouched
