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

    ``docs``: (doc_id, text[, lang]). ``stored``: (query_id, terms
    array<string>, mode ∈ 'or'|'and'[, flt_lang, flt_min_nchars]). OR
    matches on ≥1 shared term, AND on all of the query's terms.

    Optional STRUCTURED constraints per stored query (ES percolator
    queries are full bool bodies — match + filters; percolate.go:18):
    ``flt_lang`` (doc.lang equality) and ``flt_min_nchars``
    (length(text) ≥). NULL = unconstrained. Constraints are evaluated
    AFTER the term join on the (already tiny) candidate pair set, so
    the scalable shape — work ∝ term overlap, never |docs|×|queries| —
    is preserved; the doc-attribute join is per candidate pair, keyed
    on doc_id."""
    flt_cols = [c for c in ("flt_lang", "flt_min_nchars") if c in stored.columns]
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("term")
    )
    q_terms = stored.select(
        "query_id",
        F.size("terms").alias("n_terms"),
        "mode",
        *flt_cols,
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    hits = (
        doc_terms.join(q_terms, "term")
        .groupBy("doc_id", "query_id", "mode", "n_terms", *flt_cols)
        .agg(F.countDistinct("term").alias("matched"))
    )
    keep = F.when(F.col("mode") == "and", F.col("matched") == F.col("n_terms")).otherwise(
        F.col("matched") >= 1
    )
    out = hits.where(keep)
    if flt_cols:
        attrs = docs.select(
            "doc_id",
            *(["lang"] if "lang" in docs.columns else []),
            F.length("text").alias("_nchars"),
        )
        out = out.join(attrs, "doc_id")
        if "flt_lang" in flt_cols:
            # docs without a lang column: the constraint is
            # unsatisfiable (NULL lang ≠ any required value), matching
            # the NULL-comparison semantics a real lang column with
            # NULL rows would give — not an AnalysisException (ADVICE r3)
            lang_col = F.col("lang") if "lang" in docs.columns else F.lit(None).cast("string")
            out = out.where(F.col("flt_lang").isNull() | (F.col("flt_lang") == lang_col))
        if "flt_min_nchars" in flt_cols:
            out = out.where(
                F.col("flt_min_nchars").isNull()
                | (F.col("_nchars") >= F.col("flt_min_nchars"))
            )
    return out.select("doc_id", "query_id")
