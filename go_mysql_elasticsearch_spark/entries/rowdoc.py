"""Row→doc transform entries (reference T4-T12 parity over the driver
tables; enum/set/pk columns derived deterministically from doc_id so
the DuckDB oracle reproduces them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import index_for
from ..sources.rowdoc import Rule, convert_rows


def _docs(spark, sf_dir):
    return index_for(spark, sf_dir).docstore()


def q_rowdoc_convert(spark, sf_dir):
    """T4/T6/T7/T8/T10/T11 in one conversion: synthetic relational row
    (id, lang, tags, tenum, tset, parent) → document."""
    src = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        F.col("lang"),
        F.concat(F.col("lang"), F.lit(","), F.lit("web")).alias("tags"),
        (F.col("doc_id") % 4).cast("int").alias("tenum"),
        (F.col("doc_id") % 8).cast("int").alias("tset"),
        (F.col("doc_id") % 10).alias("parent"),
    )
    rule = Rule(
        pk_cols=["id"],
        field_mapping={"tags": "tag_list,list", "lang": "language"},
        enum_values={"tenum": ["e1", "e2", "e3"]},
        set_values={"tset": ["a", "b", "c"]},
        parent_col="parent",
    )
    out = convert_rows(src, rule)
    return out.select(
        "_id", "_parent", "language", F.array_join("tag_list", "|").alias("tags"),
        "tenum", "tset", "id",
    )


ENTRIES = {
    "rowdoc_convert": (
        q_rowdoc_convert,
        """SELECT doc_id::VARCHAR AS _id,
       (doc_id % 10)::VARCHAR AS _parent,
       lang AS language,
       lang || '|' || 'web' AS tags,
       CASE WHEN doc_id % 4 = 0 THEN '' ELSE ['e1','e2','e3'][(doc_id % 4)::INT] END AS tenum,
       coalesce(array_to_string(
         list_filter(['a','b','c'], x -> ((doc_id % 8) >> (list_position(['a','b','c'], x) - 1)) & 1 = 1),
         ','), '') AS tset,
       doc_id AS id
FROM documents""",
    ),
}
