"""spark-submit entrypoint: build (or resume) the inverted index.

Usage (local or any cluster master — the job itself is
master-agnostic; parallelism comes from the cluster):

    python tools/make_pyfiles.py                  # → dist/engine.zip
    spark-submit --master <url> \\
        --py-files dist/engine.zip \\
        jobs/build_index_job.py \\
        --input /root/testdata/sf0.01/documents.parquet \\
        --index-dir /tmp/idx --segments 2 --shards 8

Resumability: re-running after a kill skips segments whose manifest
exists (reference parity: canal/dump.go:103-126). Prints one JSON line
with the manifests.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="docs source: parquet path OR catalog table name (e.g. an Iceberg table 'cat.db.webpages') with (doc_id, text[, url, warc_ts, lang]) or webpages (html)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--extract-html", action="store_true", help="input has html binary; extract text via Arrow UDF")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("build-inverted-index").getOrCreate()

    from go_mysql_elasticsearch_spark.analyzer import extract_text_udf
    from go_mysql_elasticsearch_spark.index.build import build_index
    from go_mysql_elasticsearch_spark.sources.ingest import load_table

    docs = load_table(spark, args.input)
    if args.extract_html:
        docs = docs.withColumn("text", extract_text_udf("html")).drop("html")
    manifests = build_index(
        spark, docs, args.index_dir,
        n_segments=args.segments, n_shards=args.shards, block_size=args.block_size,
    )
    print(json.dumps({"manifests": manifests}))


if __name__ == "__main__":
    main()
