"""Relational query operators: query_string, not, has_parent /
has_child / nested (SURVEY.md §2.4 compound family + §2.5 joins).

Parent/child reproduces the reference's parent-routing feature
(config/rule.go:85-95, river/converter.go:110-133, test
river/river_test.go:217-232): children carry parent = doc_id % 10;
parent docs are doc_id < 10. Joins are left_semi/left_anti with the
small side broadcast — the Spark mapping called out in SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..query.querystring import query_string_oracle_sql, query_string_topk
from ..query.scoring import ROUND_DIGITS, bm25_ctes

_R = ROUND_DIGITS
from ..query.wand import bm25_topk
from ..registry import index_for

QS_FIXTURE = '+data -slow merge "hash join"'
# distinct fixture for the simple grammar entry: phrase + required +
# negated + plain-OR clauses all exercised
SQS_FIXTURE = '"sort merge" +scan -vector filter'


def q_query_string(spark, sf_dir):
    return query_string_topk(spark, index_for(spark, sf_dir), QS_FIXTURE, k=10)


def q_simple_query_string(spark, sf_dir):
    """simple_query_string (search_queries_simple_query_string.go:19):
    the lenient +/-/""/OR grammar — no field prefixes or wildcard
    syntax, which is exactly the subset this engine's mini-grammar
    implements (query/querystring.py). Distinct fixture from
    query_string so each entry gates its own clause mix."""
    from ..query.querystring import query_string_topk

    return query_string_topk(spark, index_for(spark, sf_dir), SQS_FIXTURE, k=10)


def q_not(spark, sf_dir):
    """not query (search_queries_not.go:11): match(data) minus docs
    matching 'merge' — bool(must, must_not) through the query AST
    (compiles to a left-anti join of scored frames)."""
    from ..query import ast as A

    q = A.Bool(must=(A.Match(("data",)),), must_not=(A.Match(("merge",)),))
    return A.topk(spark, index_for(spark, sf_dir), q, k=10)


def _children(r):
    """Child docs from the parent-routed fixture index: ``_parent`` was
    extracted by the rowdoc conversion rule (T11) at index time and is
    READ FROM THE DOCSTORE here — the end-to-end parent-routing path
    (config/rule.go:85-95), not a query-time re-derivation."""
    d = r.docstore()
    return d.where(F.col("_parent").isNotNull()).withColumn(
        "parent_id", F.col("_parent").cast("long")
    )


def q_has_child(spark, sf_dir):
    """has_child (search_queries_has_child.go:12): parent docs with ≥1
    child matching term 'dup' — semi-join child→parent key."""
    from ..registry import parent_index_for

    r = parent_index_for(spark, sf_dir)
    matching = _children(r).where(F.array_contains(tokens_col("text"), "dup")).select("parent_id")
    parents = r.docstore().where(F.col("_parent").isNull()).select("doc_id", "lang")
    return parents.join(
        F.broadcast(matching.distinct()),
        parents["doc_id"] == matching["parent_id"],
        "left_semi",
    )


def q_has_parent(spark, sf_dir):
    """has_parent (search_queries_has_parent.go:15): child docs whose
    parent doc has lang='de'."""
    from ..registry import parent_index_for

    r = parent_index_for(spark, sf_dir)
    parents = (
        r.docstore().where(F.col("_parent").isNull() & (F.col("lang") == "de"))
        .select(F.col("doc_id").alias("parent_id"))
    )
    return _children(r).join(F.broadcast(parents), "parent_id", "left_semi").select(
        "doc_id", "parent_id"
    )


def q_nested(spark, sf_dir):
    """nested (search_queries_nested.go:14): docs with a nested
    (term, tf) element matching term='dup' AND tf>=2 — explode array of
    structs, filter, regroup (the §2.4 mapping)."""
    r = index_for(spark, sf_dir)
    tf_struct = F.transform(
        F.array_distinct(tokens_col("text")),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(tokens_col("text"), lambda x: x == t)).alias("tf"),
        ),
    )
    nested = r.docstore().select("doc_id", F.explode(tf_struct).alias("e"))
    return (
        nested.where((F.col("e.term") == "dup") & (F.col("e.tf") >= 2))
        .groupBy("doc_id")
        .agg(F.max("e.tf").cast("long").alias("max_tf"))
    )


def q_min_score(spark, sf_dir):
    """search min_score (search_source.go: minScore): drop hits below a
    floor after scoring."""
    r = index_for(spark, sf_dir)
    out = bm25_topk(spark, r, ["scan"], return_all=True).where(F.col("score") >= 0.32)
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def q_post_filter(spark, sf_dir):
    """post_filter (search_source.go:13-499 PostFilter): filters the
    HITS after scoring while aggregations still see the full matched
    set. One frame carries both semantics: top-10 match(data) hits
    restricted to lang='de' post-scoring, plus total_matched = the
    PRE-filter matched count (what an agg would see) broadcast onto
    every row."""
    r = index_for(spark, sf_dir)
    scored = bm25_topk(spark, r, ["data"], return_all=True)
    d = r.docstore().select("doc_id", "lang")
    j = scored.join(d, "doc_id")
    total = j.agg(F.count(F.lit(1)).cast("long").alias("total_matched"))
    out = (
        j.where(F.col("lang") == "de")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .crossJoin(F.broadcast(total))
    )
    return out.select("doc_id", "score", "lang", "total_matched")


def q_from_size(spark, sf_dir):
    """from/size pagination (search.go:20-235): rows 6..15 of the
    ranked result — offset window over the deterministic order."""
    from pyspark.sql import Window

    r = index_for(spark, sf_dir)
    scored = bm25_topk(spark, r, ["data", "merge"], return_all=True)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > 5) & (F.col("rn") <= 15))
        .select("doc_id", "score")
    )


ENTRIES = {
    "query_string": (q_query_string, query_string_oracle_sql(QS_FIXTURE, k=10)),
    "simple_query_string": (q_simple_query_string, query_string_oracle_sql(SQS_FIXTURE, k=10)),
    "post_filter": (
        q_post_filter,
        f"""WITH {bm25_ctes(['data'])}
, sc AS (SELECT doc_id, round(sum(s), {_R}) AS score FROM persc GROUP BY doc_id)
, j AS (SELECT sc.doc_id, sc.score, d.lang FROM sc JOIN documents d ON d.doc_id = sc.doc_id)
, tot AS (SELECT count(*) AS total_matched FROM j)
SELECT j.doc_id, j.score, j.lang, tot.total_matched
FROM j CROSS JOIN tot WHERE j.lang = 'de'
ORDER BY j.score DESC, j.doc_id ASC LIMIT 10""",
    ),
    "min_score": (
        q_min_score,
        f"""WITH {bm25_ctes(['scan'])}
SELECT doc_id, round(sum(s), {ROUND_DIGITS}) AS score FROM persc GROUP BY doc_id
HAVING round(sum(s), {ROUND_DIGITS}) >= 0.32
ORDER BY score DESC, doc_id ASC""",
    ),
    "from_size": (
        q_from_size,
        f"""WITH {bm25_ctes(['data', 'merge'])}
, sc AS (SELECT doc_id, round(sum(s), {ROUND_DIGITS}) AS score FROM persc GROUP BY doc_id)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 5""",
    ),
    "not_query": (
        q_not,
        f"""WITH {bm25_ctes(['data', 'merge'])}
, cl AS (SELECT doc_id,
         round(sum(s) FILTER (WHERE term = 'data'), {ROUND_DIGITS}) AS sp,
         count(*) FILTER (WHERE term = 'merge') AS neg
  FROM persc GROUP BY doc_id)
SELECT doc_id, sp AS score FROM cl WHERE sp IS NOT NULL AND neg = 0
ORDER BY score DESC, doc_id ASC LIMIT 10""",
    ),
    "has_child": (
        q_has_child,
        """SELECT p.doc_id, p.lang FROM documents p
WHERE p.doc_id < 10 AND EXISTS (
  SELECT 1 FROM documents c
  WHERE c.doc_id >= 10 AND c.doc_id % 10 = p.doc_id
    AND list_contains(regexp_extract_all(lower(c.text), '[a-z0-9]+'), 'dup'))""",
    ),
    "has_parent": (
        q_has_parent,
        """SELECT c.doc_id, c.doc_id % 10 AS parent_id FROM documents c
WHERE c.doc_id >= 10 AND EXISTS (
  SELECT 1 FROM documents p
  WHERE p.doc_id < 10 AND p.doc_id = c.doc_id % 10 AND p.lang = 'de')""",
    ),
    "nested_query": (
        q_nested,
        """WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents)
  GROUP BY doc_id, term
)
SELECT doc_id, max(tf)::BIGINT AS max_tf FROM tf
WHERE term = 'dup' AND tf >= 2 GROUP BY doc_id""",
    ),
}
