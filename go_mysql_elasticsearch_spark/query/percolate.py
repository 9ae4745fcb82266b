"""Percolate — reverse search at batch scale.

Reference: percolate.go:18 (one doc probed against stored queries).
The round-1 entry cross-joined ONE doc against the stored set; this is
the general operator: a BATCH of docs against a TABLE of stored term
queries, matched via explode + shuffle-on-term join — the shape that
scales to 10^9 docs × 10^6 stored queries (each side explodes to its
term rows; the join key is the term, so matching work is proportional
to actual term overlap, never |docs| × |queries|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col


def percolate(docs: DataFrame, stored: DataFrame) -> DataFrame:
    """(doc_id, query_id) pairs where the stored query matches the doc.

    ``docs``: (doc_id, text). ``stored``: (query_id, terms
    array<string>, mode ∈ 'or'|'and'). OR matches on ≥1 shared term,
    AND on all of the query's terms."""
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("term")
    )
    q_terms = stored.select(
        "query_id",
        F.size("terms").alias("n_terms"),
        "mode",
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    hits = (
        doc_terms.join(q_terms, "term")
        .groupBy("doc_id", "query_id", "mode", "n_terms")
        .agg(F.countDistinct("term").alias("matched"))
    )
    keep = F.when(F.col("mode") == "and", F.col("matched") == F.col("n_terms")).otherwise(
        F.col("matched") >= 1
    )
    return hits.where(keep).select("doc_id", "query_id")
