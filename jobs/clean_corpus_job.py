"""spark-submit entrypoint: run the corpus-cleaning funnel and write
the cleaned corpus + one JSON stats line.

    spark-submit --master <url> --py-files dist/engine.zip \\
        jobs/clean_corpus_job.py \\
        --input /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/cleaned.parquet

Chain with build_index_job.py (--input /tmp/cleaned.parquet) for the
full clean -> index pipeline.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="docs source: parquet path or catalog table")
    ap.add_argument("--output", required=True, help="cleaned-corpus parquet path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("clean-corpus").getOrCreate()

    from go_mysql_elasticsearch_spark.pipeline.clean import clean_corpus
    from go_mysql_elasticsearch_spark.sources.ingest import load_table

    docs = load_table(spark, args.input)
    cleaned, stats = clean_corpus(docs)
    cleaned.write.mode("overwrite").parquet(args.output)
    print(json.dumps(stats.collect()[0].asDict()))


if __name__ == "__main__":
    main()
