"""Scripted update_by_query (update_by_query.go + update.go script
path) and reindex (reindexer.go): distributed mutation/copy operators
over a live index."""

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query.wand import bm25_topk
from go_mysql_elasticsearch_spark.streaming.incremental import (
    reindex,
    update_by_query,
)

from .conftest import SF_SMALL


def _base_docs(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", F.concat(F.lit("u"), "doc_id").alias("url"), "lang", "text")
    )


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "ubq_idx")
    build_index(spark, _base_docs(spark), d, n_segments=1, n_shards=2)
    return d


def test_update_by_query_scripted_field(spark, idx):
    """Docs matching 'dup' get lang rewritten by script; non-matching
    docs keep theirs; the updated docs stay query-visible with their
    new stored fields."""
    r0 = IndexReader(spark, idx)
    matched = {
        r["doc_id"]
        for r in bm25_topk(spark, r0, ["dup"], return_all=True).select("doc_id").collect()
    }
    assert matched, "fixture needs at least one 'dup' doc"
    n = update_by_query(spark, idx, ["dup"], "ctx._source.lang = 'xx'", n_shards=2)
    assert n == len(matched)
    r1 = IndexReader(spark, idx)
    langs = {
        row["doc_id"]: row["lang"]
        for row in r1.docstore().select("doc_id", "lang").collect()
    }
    for d in matched:
        assert langs[d] == "xx"
    assert any(v != "xx" for v in langs.values()), "non-matching docs must keep lang"
    # updated docs still match the query (text unchanged)
    still = {
        r["doc_id"]
        for r in bm25_topk(spark, IndexReader(spark, idx), ["dup"], return_all=True)
        .select("doc_id")
        .collect()
    }
    assert still == matched


def test_update_by_query_with_params(spark, idx):
    """Script params (script.go:71-75) bind at parse time."""
    n = update_by_query(
        spark, idx, ["dup"], "ctx._source.lang = tag", params={"tag": "zz"}, n_shards=2
    )
    assert n > 0
    r = IndexReader(spark, idx)
    assert r.docstore().where(F.col("lang") == "zz").count() == n


def test_reindex_filtered(spark, idx, tmp_path):
    """Reindex only docs matching 'dup' into a fresh index: the target
    equals a fresh build over exactly that doc subset (same top-k docs
    and scores)."""
    dst = str(tmp_path / "dst_idx")
    reindex(spark, idx, dst, query=["dup"], n_shards=2)

    src_reader = IndexReader(spark, idx)
    matched = bm25_topk(spark, src_reader, ["dup"], return_all=True).select("doc_id")
    fresh = str(tmp_path / "fresh_idx")
    build_index(
        spark,
        _base_docs(spark).join(matched, "doc_id", "left_semi"),
        fresh,
        n_segments=1,
        n_shards=2,
    )
    got = bm25_topk(spark, IndexReader(spark, dst), ["dup"], k=20).collect()
    want = bm25_topk(spark, IndexReader(spark, fresh), ["dup"], k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_reindex_with_transform_script(spark, idx, tmp_path):
    """Reindex + script: every copied doc gets lang='re'; target
    docstore reflects the transform, source is untouched."""
    dst = str(tmp_path / "dst2_idx")
    reindex(spark, idx, dst, script="ctx._source.lang = 're'", n_shards=2)
    dstr = IndexReader(spark, dst)
    total = dstr.docstore().count()
    assert total == IndexReader(spark, idx).docstore().count()
    assert dstr.docstore().where(F.col("lang") == "re").count() == total
    assert IndexReader(spark, idx).docstore().where(F.col("lang") == "re").count() == 0


def test_percolate_filtered_without_lang_column(spark):
    """ADVICE r3: a lang-constrained stored query over docs lacking a
    lang column treats the constraint as unmatchable, not an
    AnalysisException."""
    from go_mysql_elasticsearch_spark.query.percolate import percolate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha only here")], "doc_id long, text string"
    )
    stored = spark.createDataFrame(
        [
            (10, ["alpha"], "or", "de", None),
            (11, ["alpha"], "or", None, None),
        ],
        "query_id long, terms array<string>, mode string, flt_lang string, flt_min_nchars int",
    )
    got = {(r["doc_id"], r["query_id"]) for r in percolate(docs, stored).collect()}
    # query 10 requires lang='de' — unmatchable without a lang column;
    # query 11 is unconstrained and matches both docs
    assert got == {(0, 11), (1, 11)}
