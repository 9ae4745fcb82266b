"""The packaged spark-submit flow (north-rule claim: 'runs via
spark-submit --py-files on multi-executor clusters'): zip the engine,
submit the clean + build jobs as a real spark-submit subprocess, then
open the built index from THIS process and query it."""

import json
import os
import subprocess
import sys

import pytest

from .conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)


def _submit(job: str, *args: str) -> str:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", os.path.join(REPO, "dist", "engine.zip"),
            os.path.join(REPO, "jobs", job),
            *args,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_clean_then_build_via_spark_submit(spark, tmp_path):
    cleaned = str(tmp_path / "cleaned.parquet")
    idx = str(tmp_path / "submit_idx")

    stats_line = _submit(
        "clean_corpus_job.py",
        "--input", f"{SF_SMALL}/documents.parquet",
        "--output", cleaned,
    ).strip().splitlines()[-1]
    stats = json.loads(stats_line)
    assert stats["n_clean"] > 0 and stats["total"] >= stats["n_clean"]

    build_line = _submit(
        "build_index_job.py",
        "--input", cleaned,
        "--index-dir", idx,
        "--segments", "1",
        "--shards", "2",
    ).strip().splitlines()[-1]
    manifests = json.loads(build_line)["manifests"]
    assert manifests and manifests[0]["n_docs"] == stats["n_clean"]

    # open the submitted build from this process and serve a query
    from go_mysql_elasticsearch_spark.index.reader import IndexReader
    from go_mysql_elasticsearch_spark.query.wand import bm25_topk

    hits = bm25_topk(spark, IndexReader(spark, idx), ["data"], k=5).collect()
    assert len(hits) == 5


def test_query_job_via_spark_submit(spark, tmp_path):
    """The serving twin: build once, then answer a query through a real
    spark-submit query_job invocation, and cross-check the hits against
    an in-process bm25_topk."""
    idx = str(tmp_path / "qj_idx")
    _submit(
        "build_index_job.py",
        "--input", f"{SF_SMALL}/documents.parquet",
        "--index-dir", idx,
        "--segments", "1",
        "--shards", "2",
    )
    out = _submit(
        "query_job.py", "--index-dir", idx, "--query", "data merge", "--k", "5"
    ).strip().splitlines()[-1]
    got = [(h["doc_id"], h["score"]) for h in json.loads(out)["hits"]]

    from go_mysql_elasticsearch_spark.index.reader import IndexReader
    from go_mysql_elasticsearch_spark.query.wand import bm25_topk

    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(spark, IndexReader(spark, idx), ["data", "merge"], k=5).collect()
    ]
    assert got == want
