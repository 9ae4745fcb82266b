"""Indices admin API (index/indices.py): exists/create/delete,
open/close, refresh, forcemerge, dynamic settings, mapping, warmers."""

import os

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.indices import (
    IndexClosedError,
    close_index,
    create_index,
    delete_index,
    delete_warmer,
    forcemerge,
    get_mapping,
    get_settings,
    get_warmers,
    index_exists,
    open_index,
    put_settings,
    put_warmer,
    refresh_index,
    warm,
)
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query.wand import bm25_topk
from go_mysql_elasticsearch_spark.streaming.incremental import apply_changes


def _mini(spark, tmp_path, name="idx", rows=None):
    idx = str(tmp_path / name)
    rows = rows or [(0, "alpha beta"), (1, "beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, idx, n_segments=1, n_shards=1)
    return idx


def test_exists_create_delete(spark, tmp_path):
    idx = str(tmp_path / "fresh")
    assert not index_exists(idx)
    m = create_index(spark, idx, settings={"bm25_k1": 1.5})
    assert index_exists(idx) and m["n_docs"] == 0
    with pytest.raises(ValueError, match="already exists"):
        create_index(spark, idx)
    # an empty index is searchable and returns empty results (ES parity)
    r = IndexReader(spark, idx)
    assert r.n_docs == 0
    assert bm25_topk(spark, r, ["alpha"], k=5).count() == 0
    assert get_settings(idx)["bm25_k1"] == 1.5
    delete_index(idx)
    assert not index_exists(idx)
    with pytest.raises(ValueError, match="not an index"):
        delete_index(str(tmp_path / "never-existed"))


def test_close_blocks_readers_open_restores(spark, tmp_path):
    idx = _mini(spark, tmp_path)
    close_index(idx)
    with pytest.raises(IndexClosedError):
        IndexReader(spark, idx)
    open_index(idx)
    assert IndexReader(spark, idx).n_docs == 2


def test_refresh_sees_new_segments_old_reader_pinned(spark, tmp_path):
    idx = _mini(spark, tmp_path)
    r1 = IndexReader(spark, idx)
    apply_changes(
        spark,
        idx,
        spark.createDataFrame([("insert", 9, "zeta")], "action string, doc_id long, text string"),
        n_shards=1,
    )
    assert r1.n_docs == 2  # pinned at open
    r2 = refresh_index(spark, r1)
    assert r2.n_docs == 3


def test_forcemerge_down_to_one_segment(spark, tmp_path):
    idx = str(tmp_path / "fm")
    docs = spark.createDataFrame(
        [(i, f"word{i % 5} common") for i in range(40)], "doc_id long, text string"
    )
    build_index(spark, docs, idx, n_segments=4, n_shards=1)
    before = [tuple(x) for x in bm25_topk(spark, IndexReader(spark, idx), ["common"], k=40).collect()]
    merged = forcemerge(spark, idx, max_num_segments=1)
    assert len(merged) == 3  # 4 -> 3 -> 2 -> 1, smallest-first pairs
    r = IndexReader(spark, idx)
    assert len(r.manifests) == 1
    assert [tuple(x) for x in bm25_topk(spark, r, ["common"], k=40).collect()] == before


def test_put_settings_dynamic_only_and_scoring_effect(spark, tmp_path):
    idx = _mini(spark, tmp_path, rows=[(0, "x x x y"), (1, "x y y y y y y")])
    r0 = IndexReader(spark, idx)
    s_before = {x["doc_id"]: x["score"] for x in bm25_topk(spark, r0, ["x"], k=5).collect()}
    with pytest.raises(ValueError, match="not dynamically updatable"):
        put_settings(idx, {"token_pattern": ".+"})
    put_settings(idx, {"bm25_k1": 0.2, "bm25_b": 0.0})
    assert get_settings(idx)["bm25_k1"] == 0.2
    # fresh reader scores with the updated parameters (query-time knobs)
    s_after = {x["doc_id"]: x["score"] for x in bm25_topk(spark, IndexReader(spark, idx), ["x"], k=5).collect()}
    assert s_before != s_after
    # b=0 removes length normalization: doc 0 (tf=3) must now beat doc 1
    assert s_after[0] > s_after[1]


def test_get_mapping_types(spark, tmp_path):
    idx = str(tmp_path / "map")
    docs = spark.createDataFrame(
        [(0, "t", "u")], "doc_id long, text string, url string"
    )
    build_index(spark, docs, idx, n_segments=1, n_shards=1)
    m = dict(get_mapping(IndexReader(spark, idx)))
    assert m["doc_id"] == "long" and m["text"] == "text" and m["url"] == "text"
    assert m["dl"] == "integer"  # build-derived doc length
    assert "segment" not in m


def test_warmers_crud_and_warm(spark, tmp_path):
    idx = _mini(spark, tmp_path)
    put_warmer(idx, "w1", ["alpha"])
    put_warmer(idx, "w2", ["beta", "gamma"], mode="and")
    assert set(get_warmers(idx)) == {"w1", "w2"}
    r = IndexReader(spark, idx)
    assert warm(spark, r) == 2
    # warm populated the df memo: these tids resolve with no new lookup
    from go_mysql_elasticsearch_spark.query.wand import term_ids

    tids = term_ids(spark, ["alpha", "beta", "gamma"])
    assert all(t in r._df_cache for t in tids.values())
    delete_warmer(idx, "w1")
    assert set(get_warmers(idx)) == {"w2"}


def test_cluster_health_status_ladder(spark, tmp_path):
    from go_mysql_elasticsearch_spark.index.indices import (
        close_index,
        cluster_health,
        index_stats_summary,
    )

    store = tmp_path / "cluster"
    store.mkdir()
    _mini(spark, store, name="ia")
    _mini(spark, store, name="ib", rows=[(5, "delta"), (6, "epsilon"), (7, "zeta")])
    (store / "not-an-index").mkdir()  # stray dir is ignored

    h = cluster_health(str(store))
    assert h["status"] == "green" and h["number_of_indices"] == 2
    assert h["n_docs"] == 5
    assert index_stats_summary(str(store / "ia"))["n_docs"] == 2

    # closed index degrades the cluster to yellow, docs still counted
    close_index(str(store / "ib"))
    h = cluster_health(str(store))
    assert h["status"] == "yellow" and h["indices"]["ib"]["status"] == "yellow"

    # an index skeleton with no committed manifest is red
    (store / "broken" / "segments").mkdir(parents=True)
    h = cluster_health(str(store))
    assert h["status"] == "red" and h["indices"]["broken"]["n_segments"] == 0


def test_get_index_composition(spark, tmp_path):
    from go_mysql_elasticsearch_spark.index.aliases import put_alias
    from go_mysql_elasticsearch_spark.index.indices import get_index

    idx = _mini(spark, tmp_path)
    store = str(tmp_path / "aliases")
    put_alias(store, "live", idx)
    put_alias(store, "other", str(tmp_path / "elsewhere"))
    g = get_index(spark, idx, alias_store=store)
    assert g["mappings"]["text"] == "text" and g["stats"]["n_docs"] == 2
    assert "bm25_k1" in g["settings"] and g["aliases"] == ["live"]


def test_forcemerge_expunges_deletes_on_single_segment(spark, tmp_path):
    """ES forcemerge semantics: an index already at max_num_segments
    whose tombstones still target a live segment gets ONE rewrite so
    deleted versions stop counting (found by tests/test_admin_model.py)."""
    from go_mysql_elasticsearch_spark.index.indices import index_stats_summary

    idx = _mini(spark, tmp_path, rows=[(0, "alpha"), (1, "beta"), (2, "gamma")])
    ch = spark.createDataFrame([(1, None, "delete")], "doc_id long, text string, action string")
    apply_changes(spark, idx, ch, n_shards=1)
    assert index_stats_summary(idx)["n_docs"] == 3  # tombstoned, still physical

    merged = forcemerge(spark, idx, max_num_segments=1)
    assert len(merged) == 1 and merged[0]["n_docs"] == 2
    st = index_stats_summary(idx)
    assert st["n_segments"] == 1 and st["n_docs"] == 2
    # idempotent: a second forcemerge does nothing (tombstones inert)
    assert forcemerge(spark, idx, max_num_segments=1) == []
    r = IndexReader(spark, idx)
    assert {x["doc_id"] for x in r.docstore().select("doc_id").collect()} == {0, 2}
