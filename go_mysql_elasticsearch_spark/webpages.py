"""Synthetic Common-Crawl-style ``webpages`` table (BASELINE.json input_hint).

Shape: ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — derived **deterministically** from the driver-provided
``documents.parquet`` (we never synthesize our own text corpus; the
driver's Zipf-ish corpus provides head-term skew). ``doc_id`` is kept
alongside so correctness oracles over ``documents`` line up 1:1.

Reference analogue: the MySQL source table the Go river bootstraps from
(vendor/.../schema/schema.go:37-44); ``url`` plays the role of the PK →
``_id`` mapping (config/rule.go:61-82).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from .analyzer import wrap_html

N_SITES = 97  # deterministic url spread across fake hosts


@F.pandas_udf(BinaryType())
def _wrap_html_udf(text: pd.Series, title: pd.Series) -> pd.Series:
    return pd.Series(
        [None if t is None else wrap_html(t, ti or "") for t, ti in zip(text, title)],
        dtype=object,
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, ...) → webpages(url, warc_ts, html, text, lang, doc_id).

    All columns except ``html`` are built with JVM expressions;
    ``html`` is an Arrow-batched UDF (the only Python stage).
    """
    docs = load_documents(spark, sf_dir)
    title = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))
    return docs.select(
        F.col("doc_id"),
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % N_SITES).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("doc_id") * 17)
        ).alias("warc_ts"),
        _wrap_html_udf(F.col("text"), title).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def doc_id_for_url(url_col) -> "F.Column":
    """Inverse of the url synthesis — deterministic doc key recovery.

    In the general engine the doc key IS the url (hashed); for oracle
    parity against ``documents`` we recover the integer id.
    """
    return F.regexp_extract(url_col, r"/page/(\d+)$", 1).cast("long")
