"""Corpus cleaning — the composed training-data filter chain.

Every webtext training pipeline runs the same funnel in front of
indexing/training: drop too-short docs, drop self-repetitive docs,
keep one copy per exact duplicate. This module composes the repo's
quality signals (pipeline/textstats.py) into that funnel as ONE
declarative plan with per-stage counters, and `jobs/clean_corpus_job.py`
ships it as a spark-submit step.

Precedence (each doc counted once): too_short → too_repetitive →
exact_dup → clean. The duplicate keeper is min(doc_id) per content
hash — deterministic, and at scale one hash-keyed groupBy/join (no
window over the full corpus needed; the groupBy partial-aggregates
map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from .textstats import NGRAM_N

MIN_TOKENS = 10
MAX_DUP_NGRAM_FRAC = 0.2


def classify(docs: DataFrame) -> DataFrame:
    """docs + a `verdict` column ∈ too_short | too_repetitive |
    exact_dup | clean."""
    from .textstats import ngrams_col

    t = tokens_col("text")
    n_tok = F.size(t)
    grams = ngrams_col(t, NGRAM_N)
    n_g = F.size(grams)
    dup_frac = F.when(
        n_g > 0, 1.0 - F.size(F.array_distinct(grams)) / n_g.cast("double")
    ).otherwise(0.0)
    staged = docs.withColumn("_n_tok", n_tok).withColumn("_dup_frac", dup_frac)
    # duplicate keeper among docs that survive the per-doc filters
    survivors = staged.where(
        (F.col("_n_tok") >= MIN_TOKENS) & (F.col("_dup_frac") <= MAX_DUP_NGRAM_FRAC)
    )
    keepers = (
        survivors.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    # shuffle hash join on the content hash — at 10^12 docs the keeper
    # table is corpus-sized, so no broadcast; AQE picks the strategy
    out = (
        staged.withColumn("_h", F.md5("text"))
        .join(keepers, "_h", "left")
        .withColumn(
            "verdict",
            F.when(F.col("_n_tok") < MIN_TOKENS, "too_short")
            .when(F.col("_dup_frac") > MAX_DUP_NGRAM_FRAC, "too_repetitive")
            .when(F.col("doc_id") != F.col("_keep_id"), "exact_dup")
            .otherwise("clean"),
        )
    )
    return out.drop("_h", "_keep_id")


def clean_corpus(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(cleaned docs, one-row stats frame with per-stage counts)."""
    cl = classify(docs)
    cleaned = cl.where(F.col("verdict") == "clean").drop("verdict", "_n_tok", "_dup_frac")
    stats = cl.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(F.when(F.col("verdict") == "too_short", 1).otherwise(0)).cast("long").alias("n_short"),
        F.sum(F.when(F.col("verdict") == "too_repetitive", 1).otherwise(0)).cast("long").alias("n_repetitive"),
        F.sum(F.when(F.col("verdict") == "exact_dup", 1).otherwise(0)).cast("long").alias("n_exact_dup"),
        F.sum(F.when(F.col("verdict") == "clean", 1).otherwise(0)).cast("long").alias("n_clean"),
    )
    return cleaned, stats


def clean_stats_sql(tokens_sql: str) -> str:
    """DuckDB twin of the stats frame."""
    return f"""WITH tk AS (
  SELECT doc_id, text, {tokens_sql} AS t FROM documents
),
g AS (
  SELECT doc_id, text, len(t) AS n_tok,
         [array_to_string(t[i:i+{NGRAM_N - 1}], ' ')
          FOR i IN range(1, greatest(len(t) - {NGRAM_N - 2}, 1))] AS grams
  FROM tk
),
staged AS (
  SELECT doc_id, text, n_tok,
         CASE WHEN len(grams) > 0
              THEN 1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE
              ELSE 0.0 END AS dup_frac
  FROM g
),
keepers AS (
  SELECT md5(text) AS h, min(doc_id) AS keep_id FROM staged
  WHERE n_tok >= {MIN_TOKENS} AND dup_frac <= {MAX_DUP_NGRAM_FRAC}
  GROUP BY md5(text)
),
v AS (
  SELECT s.doc_id,
         CASE WHEN s.n_tok < {MIN_TOKENS} THEN 'too_short'
              WHEN s.dup_frac > {MAX_DUP_NGRAM_FRAC} THEN 'too_repetitive'
              WHEN s.doc_id <> k.keep_id THEN 'exact_dup'
              ELSE 'clean' END AS verdict
  FROM staged s LEFT JOIN keepers k ON k.h = md5(s.text)
)
SELECT count(*)::BIGINT AS total,
       (count(*) FILTER (WHERE verdict = 'too_short'))::BIGINT AS n_short,
       (count(*) FILTER (WHERE verdict = 'too_repetitive'))::BIGINT AS n_repetitive,
       (count(*) FILTER (WHERE verdict = 'exact_dup'))::BIGINT AS n_exact_dup,
       (count(*) FILTER (WHERE verdict = 'clean'))::BIGINT AS n_clean
FROM v"""
