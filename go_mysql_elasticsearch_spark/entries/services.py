"""Retrieval-service operators beyond plain _search (SURVEY §2.4
residual client surface): msearch (msearch.go), termvectors
(termvectors.go / mtermvectors.go), field_stats (field_stats.go),
template query (search_queries_template_query.go:15 +
search_template.go), inner hits (inner_hit.go:16), fuzzy completion
suggester (suggester_completion_fuzzy.go:12).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..analyzer import duckdb_tokens_sql, tokens_col
from ..query.scoring import ROUND_DIGITS, bm25_ctes
from ..registry import index_for

_R = ROUND_DIGITS


def _docstore(spark, sf_dir):
    return index_for(spark, sf_dir).docstore()


# --- msearch ---------------------------------------------------------------

MSEARCH = [(0, ["data", "merge"], "or"), (1, ["scan"], "or"), (2, ["dup", "scan"], "and")]


def q_msearch(spark, sf_dir):
    """msearch (msearch.go): a BATCH of independent searches answered in
    one round trip — ONE pruned postings pull for the union of every
    sub-query's terms (query/wand.py bm25_topk_batch), each sub-query
    scored from its slice of the shared frame. An N-query msearch costs
    one scan, not N."""
    from ..query.wand import bm25_topk_batch

    r = index_for(spark, sf_dir)
    results = bm25_topk_batch(spark, r, [(terms, mode) for _, terms, mode in MSEARCH], k=5)
    frames = []
    for (qid, _, _), hits in zip(MSEARCH, results):
        frames.append(hits.select(F.lit(qid).alias("qid"), "doc_id", "score"))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.orderBy("qid", F.desc("score"), F.asc("doc_id"))


def _msearch_sql() -> str:
    all_terms = sorted({t for _, ts, _ in MSEARCH for t in ts})
    subs = []
    for qid, terms, mode in MSEARCH:
        in_list = ", ".join(f"'{t}'" for t in terms)
        if mode == "and":  # every term must be present (ADVICE r3)
            having = f"count(DISTINCT term) FILTER (WHERE term IN ({in_list})) = {len(set(terms))}"
        else:
            having = f"sum(s) FILTER (WHERE term IN ({in_list})) IS NOT NULL"
        subs.append(
            f"(SELECT {qid} AS qid, doc_id, round(sum(s) FILTER (WHERE term IN ({in_list})), {_R}) AS score\n"
            f" FROM persc GROUP BY doc_id\n"
            f" HAVING {having}\n"
            f" ORDER BY score DESC, doc_id ASC LIMIT 5)"
        )
    union = "\nUNION ALL\n".join(subs)
    return f"""WITH {bm25_ctes(all_terms)}
SELECT * FROM ({union})
ORDER BY qid, score DESC, doc_id ASC"""


# --- termvectors -----------------------------------------------------------

TV_DOC = 42


def q_termvectors(spark, sf_dir):
    """termvectors (termvectors.go; mget variant mtermvectors.go):
    per-document (term, tf, positions) — ES materializes these at index
    time; here the single stored doc is re-analyzed (one-row
    projection, no corpus scan). Positions 0-based like ES; joined to a
    string for a type-stable cross-engine compare."""
    d = _docstore(spark, sf_dir).where(F.col("doc_id") == TV_DOC)
    toks = d.select("doc_id", F.posexplode(tokens_col("text")).alias("pos", "term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(F.array_sort(F.collect_list("pos")), ",").alias("positions"),
        )
        .orderBy("term")
    )


_TV_SQL = f"""WITH tv AS (
  SELECT unnest({duckdb_tokens_sql('text')}) AS term,
         generate_subscripts({duckdb_tokens_sql('text')}, 1) - 1 AS pos
  FROM documents WHERE doc_id = {TV_DOC}
)
SELECT term, count(*) AS tf,
       array_to_string(list_sort(list(pos)), ',') AS positions
FROM tv GROUP BY term ORDER BY term"""


# mtermvectors (mtermvectors.go): the multi-doc variant — same per-doc
# aggregation over doc_id IN (...), grouped by (doc_id, term)
MTV_DOCS = [7, 42, 99]


def q_mtermvectors(spark, sf_dir):
    """mtermvectors (mtermvectors.go): termvectors for a BATCH of ids in
    one round trip — one pruned docstore scan, per-(doc, term) groups."""
    d = _docstore(spark, sf_dir).where(F.col("doc_id").isin(MTV_DOCS))
    toks = d.select("doc_id", F.posexplode(tokens_col("text")).alias("pos", "term"))
    return (
        toks.groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(F.array_sort(F.collect_list("pos")), ",").alias("positions"),
        )
        .orderBy("doc_id", "term")
    )


_MTV_SQL = f"""WITH tv AS (
  SELECT doc_id, unnest({duckdb_tokens_sql('text')}) AS term,
         generate_subscripts({duckdb_tokens_sql('text')}, 1) - 1 AS pos
  FROM documents WHERE doc_id IN ({', '.join(str(d) for d in MTV_DOCS)})
)
SELECT doc_id, term, count(*) AS tf,
       array_to_string(list_sort(list(pos)), ',') AS positions
FROM tv GROUP BY doc_id, term ORDER BY doc_id, term"""


# --- field_stats -----------------------------------------------------------

def q_field_stats(spark, sf_dir):
    """field_stats (field_stats.go): per-field min/max/doc_count across
    the index — served from docstore aggregates (on parquet these come
    from footer statistics; one partial-agg pass here)."""
    d = _docstore(spark, sf_dir)
    rows = [
        d.agg(
            F.lit("doc_id").alias("field"),
            F.min("doc_id").cast("string").alias("min_value"),
            F.max("doc_id").cast("string").alias("max_value"),
            F.count("doc_id").cast("long").alias("doc_count"),
        ),
        d.agg(
            F.lit("n_chars").alias("field"),
            F.min(F.length("text")).cast("string").alias("min_value"),
            F.max(F.length("text")).cast("string").alias("max_value"),
            F.count("text").cast("long").alias("doc_count"),
        ),
        d.agg(
            F.lit("lang").alias("field"),
            F.min("lang").cast("string").alias("min_value"),
            F.max("lang").cast("string").alias("max_value"),
            F.count("lang").cast("long").alias("doc_count"),
        ),
    ]
    out = rows[0]
    for r_ in rows[1:]:
        out = out.unionByName(r_)
    return out.orderBy("field")


_FIELD_STATS_SQL = """SELECT * FROM (
SELECT 'doc_id' AS field, cast(min(doc_id) AS VARCHAR) AS min_value,
       cast(max(doc_id) AS VARCHAR) AS max_value, count(doc_id) AS doc_count FROM documents
UNION ALL
SELECT 'n_chars', cast(min(length(text)) AS VARCHAR), cast(max(length(text)) AS VARCHAR), count(text) FROM documents
UNION ALL
SELECT 'lang', cast(min(lang) AS VARCHAR), cast(max(lang) AS VARCHAR), count(lang) FROM documents
) ORDER BY field"""


# --- template query ---------------------------------------------------------

TEMPLATE_SRC = '+{{must}} {{should}} "{{p1}} {{p2}}"'
TEMPLATE_PARAMS = {"must": "data", "should": "merge", "p1": "hash", "p2": "join"}


def q_template_query(spark, sf_dir):
    """template query (search_queries_template_query.go:15,
    search_template.go): mustache-style {{param}} substitution into a
    stored query source, then normal execution — rendered here into the
    query_string grammar."""
    from ..query.querystring import query_string_topk, render_template

    rendered = render_template(TEMPLATE_SRC, TEMPLATE_PARAMS)
    return query_string_topk(spark, index_for(spark, sf_dir), rendered, k=10)


# --- inner hits --------------------------------------------------------------

def q_inner_hits(spark, sf_dir):
    """inner hits (inner_hit.go:16): a has_child query that also
    RETURNS the best matching child per parent — the parent hit plus
    its top inner hit in one frame (window row_number per parent,
    ordered by child tf desc). Children come from the parent-routed
    fixture index whose docstore carries the rowdoc-extracted
    ``_parent`` field (T11) — not a query-time synthetic key."""
    from pyspark.sql import Window

    from ..registry import parent_index_for

    r = parent_index_for(spark, sf_dir)
    d = r.docstore()
    children = (
        d.where(F.col("_parent").isNotNull())
        .withColumn("parent_id", F.col("_parent").cast("long"))
        .select(
            "parent_id",
            F.col("doc_id").alias("child_id"),
            F.size(F.filter(tokens_col("text"), lambda t: t == "dup")).alias("child_tf"),
        )
        .where(F.col("child_tf") > 0)
    )
    w = Window.partitionBy("parent_id").orderBy(F.desc("child_tf"), F.asc("child_id"))
    best = children.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.select("parent_id", "child_id", "child_tf").orderBy("parent_id")


_INNER_HITS_SQL = f"""WITH ch AS (
  SELECT doc_id % 10 AS parent_id, doc_id AS child_id,
         len(list_filter({duckdb_tokens_sql('text')}, t -> t = 'dup')) AS child_tf
  FROM documents WHERE doc_id >= 10
), m AS (
  SELECT *, row_number() OVER (PARTITION BY parent_id ORDER BY child_tf DESC, child_id ASC) AS rn
  FROM ch WHERE child_tf > 0
)
SELECT parent_id, child_id, child_tf FROM m WHERE rn = 1 ORDER BY parent_id"""


# --- script query / script fields -------------------------------------------

SCRIPT_QUERY_SRC = "doc['n_chars'].value % 7 == 0 && doc['doc_id'].value % 3 != 1"
SCRIPT_FIELD_SRC = "sqrt(doc['n_chars'].value) * factor + floor(doc['doc_id'].value / 100)"
SCRIPT_FIELD_PARAMS = {"factor": 2.5}


def q_script_query(spark, sf_dir):
    """script query (search_queries_script.go:13, script.go:15): the
    inline script is parsed ONCE on the driver (query/script.py) and
    compiled to a Catalyst predicate — filter context, score 1.0,
    evaluated vectorized in whole-stage codegen, never per-row."""
    from ..query.script import parse_script, spark_fields, to_column

    pred = to_column(parse_script(SCRIPT_QUERY_SRC), spark_fields())
    return (
        _docstore(spark, sf_dir)
        .where(pred)
        .select("doc_id", F.lit(1.0).alias("score"))
    )


def _script_query_sql() -> str:
    from ..query.script import SQL_FIELDS, parse_script, to_sql

    return (
        "SELECT doc_id, 1.0::DOUBLE AS score FROM documents "
        f"WHERE {to_sql(parse_script(SCRIPT_QUERY_SRC), SQL_FIELDS)}"
    )


def q_script_fields(spark, sf_dir):
    """script_fields (search_source.go ScriptFields + script.go Params):
    top-k match hits carrying an extra per-hit computed field — params
    substituted at parse time, expression runs as a Catalyst projection
    over the hit set only (never the corpus)."""
    from ..query.script import parse_script, spark_fields, to_column
    from ..query.wand import bm25_topk

    node = parse_script(SCRIPT_FIELD_SRC, SCRIPT_FIELD_PARAMS)
    hits = bm25_topk(spark, index_for(spark, sf_dir), ["data"], k=10)
    d = _docstore(spark, sf_dir).select("doc_id", "text")
    return (
        hits.join(d, "doc_id")
        .select(
            "doc_id",
            "score",
            F.round(to_column(node, spark_fields()), 6).alias("computed"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _script_fields_sql() -> str:
    from ..query.script import parse_script, to_sql

    qualified = {
        "doc_id": "CAST(d.doc_id AS BIGINT)",
        "n_chars": "CAST(length(d.text) AS BIGINT)",
        "lang": "d.lang",
    }
    expr = to_sql(parse_script(SCRIPT_FIELD_SRC, SCRIPT_FIELD_PARAMS), qualified)
    return f"""WITH {bm25_ctes(['data'])}
, sc AS (
  SELECT doc_id, round(sum(s), {_R}) AS score FROM persc GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT sc.doc_id, sc.score, round({expr}, 6) AS computed
FROM sc JOIN documents d ON d.doc_id = sc.doc_id
ORDER BY sc.score DESC, sc.doc_id ASC"""


# --- raw JSON DSL query ------------------------------------------------------

RAW_DSL_BODY = """{
  "bool": {
    "must": [{"match": {"text": {"query": "data merge", "minimum_should_match": 2}}}],
    "should": [{"match": {"text": {"query": "hash join", "type": "phrase"}}}],
    "must_not": [{"term": {"lang": "zh"}}],
    "filter": [{"range": {"n_chars": {"gt": 40}}}]
  }
}"""


def q_raw_dsl(spark, sf_dir):
    """RawStringQuery (search_queries_raw_string.go:13): the exact JSON
    body a reference user sends to ES, decoded by query/dsl.py into the
    AST and executed — bool(must=match msm=2, should=match_phrase,
    must_not=term, filter=range) in one wire-format round trip."""
    from ..query.dsl import raw_string_topk

    return raw_string_topk(spark, index_for(spark, sf_dir), RAW_DSL_BODY, k=10)


_RAW_DSL_SQL = f"""WITH {bm25_ctes(['data', 'merge', 'hash', 'join'])}
, m AS (
  SELECT doc_id, round(sum(s) FILTER (WHERE term IN ('data','merge')), {_R}) AS sm
  FROM persc GROUP BY doc_id
  HAVING count(*) FILTER (WHERE term IN ('data','merge')) >= 2
),
phrase_docs AS (
  SELECT DISTINCT doc_id FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2 AND t[i] = 'hash' AND t[i+1] = 'join'
),
ph AS (
  SELECT doc_id, round(sum(s), {_R}) AS sp FROM persc
  WHERE term IN ('hash','join') AND doc_id IN (SELECT doc_id FROM phrase_docs)
  GROUP BY doc_id HAVING count(*) = 2
)
SELECT m.doc_id, round(m.sm + coalesce(ph.sp, 0), {_R}) AS score
FROM m JOIN documents d ON d.doc_id = m.doc_id
LEFT JOIN ph ON ph.doc_id = m.doc_id
WHERE (d.lang IS NULL OR d.lang <> 'zh') AND length(d.text) > 40
ORDER BY score DESC, m.doc_id ASC LIMIT 10"""


# --- fuzzy completion suggester ----------------------------------------------

FUZZY_PREFIX = "scn"  # typo for 'sca...' — matches 'scan' at edit 1


def q_suggest_completion_fuzzy(spark, sf_dir):
    """fuzzy completion suggester (suggester_completion_fuzzy.go:12):
    completion where the PREFIX itself tolerates one edit — candidates
    whose first len(prefix) chars are within levenshtein 1, weighted by
    df, top-5 (weight desc, term asc)."""
    r = index_for(spark, sf_dir)
    n = len(FUZZY_PREFIX)
    return (
        r.term_strings()
        .where(F.levenshtein(F.substring("term", 1, n), F.lit(FUZZY_PREFIX)) <= 1)
        .select("term", F.col("df").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(5)
    )


def _fuzzy_completion_sql() -> str:
    n = len(FUZZY_PREFIX)
    return f"""WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS t FROM documents
), dict AS (
  SELECT term, count(*) AS weight
  FROM (SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks)
  GROUP BY term
)
SELECT term, weight FROM dict
WHERE levenshtein(substr(term, 1, {n}), '{FUZZY_PREFIX}') <= 1
ORDER BY weight DESC, term ASC LIMIT 5"""


# --- context suggesters ------------------------------------------------------

CTX_PREFIX = "s"
CTX_LANG = "en"
CTX_POINT = (57.0, 10.0)
CTX_GEO_PRECISION = 1


def _ctx_cell() -> str:
    """Geohash cell of the query point — computed once with the SAME
    dialect-common expression both engines use for doc cells."""
    import duckdb

    from ..query.geo import geohash_sql

    return duckdb.sql(
        f"SELECT {geohash_sql(str(CTX_POINT[0]), str(CTX_POINT[1]), CTX_GEO_PRECISION)}"
    ).fetchone()[0]


def q_suggest_context_category(spark, sf_dir):
    """completion suggester with a CATEGORY context
    (suggester_context_category.go:14): candidates restricted to docs
    carrying the context value (lang=en) — ES keeps one FST per
    context; here the context-scoped dictionary is a filtered
    distinct-(doc,term) count. The lang filter pushes into the parquet
    scan before tokenization touches anything."""
    d = _docstore(spark, sf_dir).where(F.col("lang") == CTX_LANG)
    toks = d.select(F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
    return (
        toks.where(F.col("term").startswith(CTX_PREFIX))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(5)
    )


_CTX_CATEGORY_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest(list_distinct({duckdb_tokens_sql('text')})) AS term
  FROM documents WHERE lang = '{CTX_LANG}'
)
SELECT term, count(*) AS weight FROM toks
WHERE term LIKE '{CTX_PREFIX}%'
GROUP BY term ORDER BY weight DESC, term ASC LIMIT 5"""


def q_suggest_context_geo(spark, sf_dir):
    """completion suggester with a GEO context
    (suggester_context_geo.go:16): candidates restricted to docs whose
    geohash cell (precision {CTX_GEO_PRECISION}) equals the query
    point's cell — ES buckets completion entries by geohash context;
    the cell key is the dialect-common arithmetic geohash
    (query/geo.py), so the oracle reproduces it bit-for-bit."""
    from ..query.geo import geohash_sql, lat_col, lon_col

    cell = _ctx_cell()
    d = (
        _docstore(spark, sf_dir)
        .withColumn("lat", lat_col())
        .withColumn("lon", lon_col())
        .where(F.expr(geohash_sql("lat", "lon", CTX_GEO_PRECISION)) == cell)
    )
    toks = d.select(F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
    return (
        toks.where(F.col("term").startswith(CTX_PREFIX))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(5)
    )


def _ctx_geo_sql() -> str:
    from ..query.geo import LAT_SQL, LON_SQL, geohash_sql

    return f"""WITH g AS (
  SELECT doc_id, text, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM documents
), toks AS (
  SELECT doc_id, unnest(list_distinct({duckdb_tokens_sql('text')})) AS term
  FROM g WHERE {geohash_sql('lat', 'lon', CTX_GEO_PRECISION)} = '{_ctx_cell()}'
)
SELECT term, count(*) AS weight FROM toks
WHERE term LIKE '{CTX_PREFIX}%'
GROUP BY term ORDER BY weight DESC, term ASC LIMIT 5"""


def _template_oracle() -> str:
    from ..query.querystring import query_string_oracle_sql, render_template

    return query_string_oracle_sql(render_template(TEMPLATE_SRC, TEMPLATE_PARAMS), k=10)


# --- _source filtering -------------------------------------------------------


def source_filter_cols(names, includes=None, excludes=None):
    """Resolve ES _source include/exclude glob patterns against a
    column list (fetch_source_context.go:13 — FetchSourceContext's
    Include/Exclude wildcards). ES filters the _source JSON per hit at
    fetch time; columnar, the resolution happens ONCE at plan time and
    becomes column pruning, so at 100 TB the excluded fields are never
    even read from parquet (ReadSchema shrinks)."""
    from fnmatch import fnmatch

    inc = [c for c in names if any(fnmatch(c, p) for p in includes)] if includes else list(names)
    return [c for c in inc if not (excludes and any(fnmatch(c, p) for p in excludes))]


def q_source_filtering(spark, sf_dir):
    """match(data) top-10 hits with _source: include ["doc_id","*l"],
    exclude ["dl"] — resolves to (doc_id, url) against the docstore
    schema, then one broadcast-friendly hit join."""
    from ..query.wand import bm25_topk

    r = index_for(spark, sf_dir)
    hits = bm25_topk(spark, r, ["data"], k=10)
    src = _docstore(spark, sf_dir)
    cols = source_filter_cols(src.columns, includes=["doc_id", "*l"], excludes=["dl"])
    out = hits.join(src.select(*cols), "doc_id")
    return out.select(*cols, "score").orderBy(F.desc("score"), F.asc("doc_id"))


# --- _analyze --------------------------------------------------------------


def q_analyze(spark, sf_dir):
    """The _analyze API: run the index analyzer over stored text and
    return ES-shaped token rows (token, position, start/end offsets).

    The reference relies on Elasticsearch's _analyze to debug the
    analyzers its settings files configure (river/river.go:82-139 ships
    opaque <index>.idx.json to ES). Here the analyzer is the persisted
    token regex, and offsets are computed INSIDE whole-stage codegen:
    the lowered text is split into (separator, token) interleavings and
    the offset of token i is the running length of seps[..i] plus
    toks[..i-1] — pure higher-order array expressions, no UDF, so at
    100 TB the analyze pass is a shuffle-free projection. Offsets are
    over the lowercased text, which for the ASCII analyzer equals the
    original-byte offsets ES reports."""
    docs = _docstore(spark, sf_dir).where(F.col("doc_id") < 5)
    d = docs.select(
        "doc_id",
        tokens_col("text").alias("toks"),
        F.split(F.lower(F.col("text")), "[a-z0-9]+").alias("seps"),
    )
    out = d.select(
        "doc_id",
        F.explode(
            F.expr(
                """transform(toks, (t, i) -> struct(
                     i AS position, t AS token,
                     cast(aggregate(slice(seps, 1, i+1), 0L, (a, x) -> a + length(x))
                        + aggregate(slice(toks, 1, i), 0L, (a, x) -> a + length(x)) AS long)
                       AS start_offset))"""
            )
        ).alias("e"),
    )
    return out.select(
        "doc_id",
        F.col("e.position").cast("long").alias("position"),
        F.col("e.token").alias("token"),
        F.col("e.start_offset").alias("start_offset"),
        (F.col("e.start_offset") + F.length("e.token")).cast("long").alias("end_offset"),
    ).orderBy("doc_id", "position")


_ANALYZE_SQL = """WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
         regexp_split_to_array(lower(text), '[a-z0-9]+') AS seps
  FROM documents WHERE doc_id < 5
),
e AS (SELECT doc_id, toks, seps, generate_subscripts(toks, 1) AS i, unnest(toks) AS token FROM d),
o AS (
  SELECT doc_id, (i - 1)::BIGINT AS position, token,
         (coalesce(list_sum(list_transform(seps[1:i], x -> length(x))), 0)
        + coalesce(list_sum(list_transform(toks[1:i-1], x -> length(x))), 0))::BIGINT AS start_offset
  FROM e
)
SELECT doc_id, position, token, start_offset,
       (start_offset + length(token))::BIGINT AS end_offset
FROM o ORDER BY doc_id, position"""


def _source_filtering_sql() -> str:
    from ..query.scoring import bm25_oracle_sql

    return f"""SELECT h.doc_id, s.url, h.score
FROM ({bm25_oracle_sql(["data"], k=10)}) h
JOIN (SELECT doc_id,
             'https://site' || (doc_id % 97)::VARCHAR || '.example/page/' || doc_id::VARCHAR AS url
      FROM documents) s USING (doc_id)
ORDER BY h.score DESC, h.doc_id ASC"""


ENTRIES = {
    "analyze": (q_analyze, _ANALYZE_SQL),
    "source_filtering": (q_source_filtering, _source_filtering_sql()),
    "msearch": (q_msearch, _msearch_sql()),
    "termvectors": (q_termvectors, _TV_SQL),
    "mtermvectors": (q_mtermvectors, _MTV_SQL),
    "field_stats": (q_field_stats, _FIELD_STATS_SQL),
    "template_query": (q_template_query, None),  # filled lazily below
    "inner_hits": (q_inner_hits, _INNER_HITS_SQL),
    "raw_dsl_query": (q_raw_dsl, _RAW_DSL_SQL),
    "script_query": (q_script_query, _script_query_sql()),
    "script_fields": (q_script_fields, _script_fields_sql()),
    "suggest_completion_fuzzy": (q_suggest_completion_fuzzy, _fuzzy_completion_sql()),
    "suggest_context_category": (q_suggest_context_category, _CTX_CATEGORY_SQL),
    "suggest_context_geo": (q_suggest_context_geo, _ctx_geo_sql()),
}
ENTRIES["template_query"] = (q_template_query, _template_oracle())
