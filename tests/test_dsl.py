"""JSON query-DSL decoder (query/dsl.py) — the wire format the
reference's client emits via Source() (search_queries_*.go) must
compile to exactly the AST a user would hand-build."""

import pytest

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query import ast as A
from go_mysql_elasticsearch_spark.query.dsl import compile_dsl

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def tiny_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dslidx") / "i")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, idx, n_segments=1, n_shards=4)
    return IndexReader(spark, idx)


@pytest.mark.parametrize(
    "body,expected",
    [
        ({"match_all": {}}, A.MatchAll()),
        ({"match_all": {"boost": 2.0}}, A.MatchAll(boost=2.0)),
        ({"match": {"text": "data merge"}}, A.Match(("data", "merge"))),
        (
            {"match": {"text": {"query": "data merge", "operator": "and"}}},
            A.Match(("data", "merge"), mode="and"),
        ),
        (
            {"match": {"text": {"query": "hash join", "type": "phrase"}}},
            A.Phrase("hash join"),
        ),
        ({"match_phrase": {"text": "hash join"}}, A.Phrase("hash join")),
        ({"term": {"lang": "de"}}, A.Term("lang", "de")),
        ({"term": {"lang": {"value": "de", "boost": 2}}}, A.Term("lang", "de")),
        ({"terms": {"lang": ["de", "fr"]}}, A.Terms("lang", ("de", "fr"))),
        ({"ids": {"values": [1, 2, 3]}}, A.Terms("doc_id", (1, 2, 3))),
        (
            {"range": {"n_chars": {"gte": 10, "lt": 99}}},
            A.Range("n_chars", gte=10, lt=99),
        ),
        ({"exists": {"field": "lang"}}, A.Exists("lang")),
        ({"missing": {"field": "lang"}}, A.Not(A.Exists("lang"))),
        ({"not": {"query": {"term": {"lang": "zh"}}}}, A.Not(A.Term("lang", "zh"))),
        (
            {"constant_score": {"filter": {"term": {"lang": "de"}}, "boost": 1.5}},
            A.ConstantScore(A.Term("lang", "de"), boost=1.5),
        ),
        (
            {
                "dis_max": {
                    "tie_breaker": 0.3,
                    "queries": [{"match": {"text": "data"}}, {"match": {"text": "merge"}}],
                }
            },
            A.DisMax((A.Match(("data",)), A.Match(("merge",))), tie_breaker=0.3),
        ),
        (
            {
                "boosting": {
                    "positive": {"match": {"text": "data"}},
                    "negative": {"match": {"text": "dup"}},
                    "negative_boost": 0.4,
                }
            },
            A.Boosting(A.Match(("data",)), A.Match(("dup",)), negative_boost=0.4),
        ),
        (
            {
                "function_score": {
                    "query": {"match": {"text": "scan"}},
                    "functions": [
                        {"weight": 0.5},
                        {"gauss": {"n_chars": {"origin": 100, "scale": 150}}},
                        {"field_value_factor": {"field": "n_chars", "factor": 0.01, "modifier": "log1p"}},
                        {"random_score": {"seed": 42}},
                    ],
                    "score_mode": "multiply",
                    "boost_mode": "sum",
                }
            },
            A.FunctionScore(
                A.Match(("scan",)),
                (
                    A.Weight(0.5),
                    A.Decay("n_chars", 100, 150, "gauss"),
                    A.FieldValueFactor("n_chars", factor=0.01, modifier="log1p"),
                    A.RandomScore(seed=42),
                ),
                score_mode="multiply",
                boost_mode="sum",
            ),
        ),
        (
            {
                "bool": {
                    "must": [{"match": {"text": "data"}}],
                    "should": {"match": {"text": "merge"}},
                    "must_not": [{"term": {"lang": "zh"}}],
                    "filter": [{"range": {"n_chars": {"gt": 50}}}],
                    "minimum_should_match": 1,
                }
            },
            A.Bool(
                must=(A.Match(("data",)),),
                should=(A.Match(("merge",)),),
                must_not=(A.Term("lang", "zh"),),
                filter=(A.Range("n_chars", gt=50),),
                minimum_should_match=1,
            ),
        ),
    ],
)
def test_compile_dsl(body, expected):
    assert compile_dsl(body) == expected


def test_match_query_text_deduped_and_analyzed():
    # analyzer lowercases + dedupes preserving order, like the index
    assert compile_dsl({"match": {"text": "Data DATA merge"}}) == A.Match(("data", "merge"))


def test_unknown_type_fails_loud():
    with pytest.raises(ValueError, match="unsupported query type"):
        compile_dsl({"span_near": {}})
    with pytest.raises(ValueError):
        compile_dsl({"match": {"text": "x"}, "term": {"lang": "de"}})


def test_unindexed_fulltext_field_rejected():
    with pytest.raises(ValueError, match="not indexed"):
        compile_dsl({"match": {"title": "data"}})


def test_raw_string_executes_like_hand_built_ast(spark, tiny_index):
    """End to end: the JSON body and the equivalent hand-built AST
    produce identical frames (search_queries_raw_string.go:13)."""
    import json

    from go_mysql_elasticsearch_spark.query.dsl import raw_string_topk

    body = json.dumps(
        {
            "bool": {
                "must": [{"match": {"text": "data"}}],
                "should": [{"match": {"text": "merge"}}],
            }
        }
    )
    got = raw_string_topk(spark, tiny_index, body, k=10).collect()
    want = A.topk(
        spark,
        tiny_index,
        A.Bool(must=(A.Match(("data",)),), should=(A.Match(("merge",)),)),
        k=10,
    ).collect()
    assert got == want
