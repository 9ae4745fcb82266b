"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over the packed inverted index
at sf0.001. ``queries()``/``oracle_sql()`` — one entry per implemented
operator (SURVEY.md §2), verified against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_mysql_elasticsearch_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build (or reuse) the packed inverted index over
    sf0.001 webpages and serve a BM25 OR-mode top-10 via block-max
    WAND."""
    from go_mysql_elasticsearch_spark.query.wand import bm25_topk

    reader = registry.index_for(spark, "/root/testdata/sf0.001")
    return bm25_topk(spark, reader, "data merge", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.build_queries()


def oracle_sql() -> dict[str, str]:
    return registry.build_oracles()
