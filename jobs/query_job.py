"""spark-submit entrypoint: serve queries against a built index.

The query-side twin of build_index_job.py — together they are the
spark-submit --py-files flow the north_star asks for:

    python tools/make_pyfiles.py                  # → dist/engine.zip
    spark-submit --master <url> \\
        --py-files dist/engine.zip \\
        jobs/query_job.py --index-dir /tmp/idx \\
        --query "data merge" --k 10                 # BM25 OR top-k
    ... --mode and                                  # conjunctive
    ... --phrase "hash join"                        # positional phrase
    ... --query-string '+data -slow "hash join"'    # mini-grammar

Prints one JSON line: the ranked (doc_id, score) hits.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", help="match query text (analyzed)")
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--phrase", help="match_phrase text")
    ap.add_argument("--query-string", help='+must -not "phrase" mini-grammar')
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    if sum(x is not None for x in (args.query, args.phrase, args.query_string)) != 1:
        ap.error("exactly one of --query / --phrase / --query-string")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bm25-query").getOrCreate()

    from go_mysql_elasticsearch_spark.index.reader import IndexReader
    from go_mysql_elasticsearch_spark.query.phrase import match_phrase
    from go_mysql_elasticsearch_spark.query.querystring import query_string_topk
    from go_mysql_elasticsearch_spark.query.wand import bm25_topk

    reader = IndexReader(spark, args.index_dir)
    if args.query is not None:
        df = bm25_topk(spark, reader, args.query, k=args.k, mode=args.mode)
    elif args.phrase is not None:
        df = match_phrase(spark, reader, args.phrase, k=args.k)
    else:
        df = query_string_topk(spark, reader, args.query_string, k=args.k)
    hits = [{"doc_id": r["doc_id"], "score": r["score"]} for r in df.collect()]
    print(json.dumps({"k": args.k, "n_hits": len(hits), "hits": hits}))


if __name__ == "__main__":
    main()
