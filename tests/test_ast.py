"""Query-AST composition semantics (query/ast.py): each compound node
must equal the hand-built frame algebra it replaced, and nodes must
nest arbitrarily."""

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query import ast as A
from go_mysql_elasticsearch_spark.query.wand import bm25_topk

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("astidx") / "i")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, idx, n_segments=1, n_shards=4)
    return IndexReader(spark, idx)


def rows(df):
    return sorted((r["doc_id"], r["score"]) for r in df.collect())


def test_bool_must_not_equals_anti_join(spark, reader):
    got = A.all_hits(
        spark, reader, A.Bool(must=(A.Match(("data",)),), must_not=(A.Match(("merge",)),))
    )
    pos = bm25_topk(spark, reader, ["data"], return_all=True)
    neg = bm25_topk(spark, reader, ["merge"], return_all=True).select("doc_id")
    want = pos.join(neg, "doc_id", "left_anti")
    assert rows(got) == rows(want)


def test_bool_minimum_should_match(spark, reader):
    """should-only bool with msm=2: docs matching >= 2 of 3 clauses."""
    q = A.Bool(
        should=(A.Match(("data",)), A.Match(("merge",)), A.Match(("dup",))),
        minimum_should_match=2,
    )
    got = {d for d, _ in rows(A.all_hits(spark, reader, q))}
    frames = [
        {r["doc_id"] for r in bm25_topk(spark, reader, [t], return_all=True).collect()}
        for t in ("data", "merge", "dup")
    ]
    want = {d for d in set.union(*frames) if sum(d in f for f in frames) >= 2}
    assert got == want and got


def test_filter_only_bool_scores_one(spark, reader):
    q = A.Bool(filter=(A.Term("lang", "de"), A.Range("n_chars", gt=50)))
    out = A.all_hits(spark, reader, q).collect()
    assert out and all(r["score"] == 1.0 for r in out)
    want = reader.docstore().where((F.col("lang") == "de") & (F.length("text") > 50)).count()
    assert len(out) == want


def test_dis_max_three_way_nesting(spark, reader):
    """dis_max over three queries, one of them itself a bool — scores
    equal the max + tie_breaker * rest identity computed by hand."""
    subs = (
        A.Match(("data",)),
        A.Match(("merge",)),
        A.Bool(must=(A.Match(("dup",)),), should=(A.Match(("scan",)),)),
    )
    got = dict(rows(A.all_hits(spark, reader, A.DisMax(subs, tie_breaker=0.5))))
    per = [dict(rows(A.all_hits(spark, reader, s))) for s in subs]
    for d, s in got.items():
        vals = [p[d] for p in per if d in p]
        want = max(vals) + 0.5 * (sum(vals) - max(vals))
        assert abs(s - want) < 1e-6, (d, s, want)  # engine rounds half-up, python half-even


def test_function_score_linear_decay_and_replace(spark, reader):
    q = A.FunctionScore(
        A.Match(("data",)),
        (A.Decay("n_chars", 100, 150, "linear"),),
        boost_mode="replace",
    )
    out = A.all_hits(spark, reader, q)
    j = out.join(
        reader.docstore().select("doc_id", F.length("text").alias("nc")), "doc_id"
    ).collect()
    assert j
    for r in j:
        want = max(0.0, 1.0 - abs(r["nc"] - 100) / 150.0)
        assert abs(r["score"] - want) < 1e-6


def test_not_node_complements_docstore(spark, reader):
    got = {d for d, _ in rows(A.all_hits(spark, reader, A.Not(A.Term("lang", "de"))))}
    alln = {r["doc_id"] for r in reader.docstore().select("doc_id").collect()}
    de = {r["doc_id"] for r in reader.docstore().where(F.col("lang") == "de").select("doc_id").collect()}
    assert got == alln - de


def test_topk_from_and_min_score(spark, reader):
    q = A.Match(("data",))
    full = [
        (r["doc_id"], r["score"])
        for r in A.topk(spark, reader, q, k=20).collect()
    ]
    page2 = [(r["doc_id"], r["score"]) for r in A.topk(spark, reader, q, k=5, from_=5).collect()]
    assert page2 == full[5:10]
    cutoff = full[3][1]
    kept = A.topk(spark, reader, q, k=1000, min_score=cutoff).collect()
    assert all(r["score"] >= cutoff for r in kept)


def test_highlight_tags_only_token_boundaries(spark):
    """ADVICE/VERDICT r2: ES highlights analyzed tokens — "data" inside
    "database" must NOT tag; standalone "data" must."""
    from go_mysql_elasticsearch_spark.entries.compound import highlight_col

    df = spark.createDataFrame(
        [(1, "my database rocks"), (2, "my data rocks"), (3, "database data")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["h"] for r in df.select("doc_id", highlight_col(["data"]).alias("h")).collect()}
    assert got[1] == ""  # no boundary match → no fragment
    assert "<em>data</em>" in got[2] and "<em>database</em>" not in got[2]
    assert "database <em>data</em>" in got[3]  # only the standalone token tagged
