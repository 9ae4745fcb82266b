"""r6 optimization: while a serving session is open, a bytes-capped
index keeps a driver-side pandas copy of the postings and the DRIVER
query path slices it locally instead of paying a per-query Spark job.
Results must be bit-identical to the closed-serving (pruned parquet
pull) path, for match AND phrase, and the copy must be released by
close_serving()."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mysql_elasticsearch_spark.index.build import build_index
from go_mysql_elasticsearch_spark.index.reader import IndexReader
from go_mysql_elasticsearch_spark.query.phrase import match_phrase
from go_mysql_elasticsearch_spark.query.wand import bm25_topk
from go_mysql_elasticsearch_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="test-serving-resident", master="local[4]")


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("residx") / "idx")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(spark, docs, d, n_segments=2, n_shards=4)
    return d


CASES = [
    (["data", "merge"], "or"),
    (["dup", "scan"], "and"),
    (["scan"], "or"),
]


def test_driver_resident_bit_identical(spark, idx):
    r = IndexReader(spark, idx)
    baseline = {
        ("match",) + tuple(terms): [
            tuple(x) for x in bm25_topk(spark, r, terms, k=5, mode=mode).collect()
        ]
        for terms, mode in CASES
    }
    baseline["phrase"] = [
        tuple(x) for x in match_phrase(spark, r, "data merge", k=5).collect()
    ]

    r.open_serving()
    try:
        assert r.driver_postings() is not None  # tiny index: under the cap
        for terms, mode in CASES:
            got = [tuple(x) for x in bm25_topk(spark, r, terms, k=5, mode=mode).collect()]
            assert got == baseline[("match",) + tuple(terms)]
        got_p = [tuple(x) for x in match_phrase(spark, r, "data merge", k=5).collect()]
        assert got_p == baseline["phrase"]
        assert any(baseline.values())  # non-trivial fixture
    finally:
        r.close_serving()
    assert r._driver_postings is None  # released with the session
    assert r.driver_postings() is None  # closed serving: no copy


def test_over_cap_index_refuses_driver_copy(spark, idx, monkeypatch):
    r = IndexReader(spark, idx)
    monkeypatch.setattr(IndexReader, "DRIVER_RESIDENT_MAX_BYTES", 0)
    r.open_serving()
    try:
        assert r.driver_postings() is None  # over the cap: pull path
        terms, mode = CASES[0]
        got = [tuple(x) for x in bm25_topk(spark, r, terms, k=5, mode=mode).collect()]
        assert got  # pull path still serves
    finally:
        r.close_serving()
