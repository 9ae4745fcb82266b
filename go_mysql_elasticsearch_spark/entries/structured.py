"""Term-level / structured predicate operators (SURVEY.md §2.4).

Reference surface: vendor/gopkg.in/olivere/elastic.v3/
search_queries_{term,terms,range,prefix,wildcard,regexp,fuzzy,ids,
exists,missing}.go, plus retrieval services (get, count, sort,
scroll/keyset pagination) from search.go / sort.go / scroll.go.

All of these run against the engine's *docstore* (stored fields) or
the *term dictionary* — exactly where ES serves them from. Catalyst
pushes every predicate into the parquet scan (PushedFilters), which is
the 100 TB story: a `term` filter on a sorted column reads only
matching row groups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import index_for

# n_chars in the oracle views equals length(text); the docstore derives
# it the same way, so both sides compute from first principles.


def _docstore(spark, sf_dir):
    return index_for(spark, sf_dir).docstore()


# --- term / terms / range / ids / exists ---------------------------------

def q_term_lang(spark, sf_dir):
    """`term` exact match (search_queries_term.go:12) — filter context."""
    return _docstore(spark, sf_dir).where(F.col("lang") == "de").select("doc_id", "lang")


def q_terms_lang(spark, sf_dir):
    """`terms` (search_queries_terms.go:12) — isin."""
    return (
        _docstore(spark, sf_dir)
        .where(F.col("lang").isin("fr", "es"))
        .select("doc_id", "lang")
    )


def q_range_nchars(spark, sf_dir):
    """`range` gt/lte (search_queries_range.go:11-76) on a derived numeric."""
    d = _docstore(spark, sf_dir).withColumn("n_chars", F.length("text"))
    return d.where((F.col("n_chars") > 100) & (F.col("n_chars") <= 200)).select(
        "doc_id", "n_chars"
    )


def q_range_ts(spark, sf_dir):
    """`range` on timestamps — partition/min-max prunable at scale."""
    d = _docstore(spark, sf_dir)
    return d.where(
        (F.col("warc_ts") >= F.lit("2024-01-01 00:30:00").cast("timestamp"))
        & (F.col("warc_ts") < F.lit("2024-01-01 01:00:00").cast("timestamp"))
    ).select("doc_id", F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"))


def q_ids(spark, sf_dir):
    """`ids` (search_queries_ids.go:12)."""
    return _docstore(spark, sf_dir).where(F.col("doc_id").isin(3, 141, 468)).select(
        "doc_id", "lang"
    )


def q_exists(spark, sf_dir):
    """`exists` (search_queries_exists.go:12) — count of docs with lang."""
    return (
        _docstore(spark, sf_dir)
        .where(F.col("lang").isNotNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# --- term-dictionary walks: prefix / wildcard / regexp / fuzzy ------------

def _term_dict(spark, sf_dir):
    return index_for(spark, sf_dir).term_strings()


def q_prefix_terms(spark, sf_dir):
    """`prefix` (search_queries_prefix.go:12) over the term dictionary."""
    return _term_dict(spark, sf_dir).where(F.col("term").startswith("s")).select(
        "term", "df"
    )


def q_wildcard_terms(spark, sf_dir):
    """`wildcard` (search_queries_wildcard.go:17): s*n via LIKE."""
    return _term_dict(spark, sf_dir).where(F.col("term").like("s%n")).select("term", "df")


def q_regexp_terms(spark, sf_dir):
    """`regexp` (search_queries_regexp.go:11)."""
    return _term_dict(spark, sf_dir).where(F.col("term").rlike("^[bc].*h$")).select(
        "term", "df"
    )


def q_fuzzy_terms(spark, sf_dir):
    """`fuzzy` (search_queries_fuzzy.go:12): levenshtein <= 1 over the
    dictionary — doubles as the `term` suggester (suggester_term.go:9)."""
    return (
        _term_dict(spark, sf_dir)
        .where(F.levenshtein(F.col("term"), F.lit("scann")) <= 1)
        .select("term", "df")
    )


def q_suggest_phrase(spark, sf_dir):
    """`phrase` suggester (suggester_phrase.go:9): correct each query
    position to the df-heaviest dictionary term within edit distance 1
    (ties → lexicographic), recompose the phrase in position order.
    Positions with NO candidate keep the original term (ES keeps the
    source token when no correction clears confidence) and contribute
    0 to the score — hence the LEFT join + coalesce. The tiny query
    side is broadcast against the term dictionary, so at scale this is
    one linear dictionary scan (same cost envelope as fuzzy/term
    suggest)."""
    from pyspark.sql import Window

    dic = _term_dict(spark, sf_dir)
    q = spark.createDataFrame(
        [(0, "datx"), (1, "mergs"), (2, "zzzqqqxx")], "pos int, qterm string"
    )
    cand = F.broadcast(q).join(dic, F.levenshtein(F.col("term"), F.col("qterm")) <= 1, "left")
    w = Window.partitionBy("pos").orderBy(F.desc_nulls_last("df"), F.asc("term"))
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "pos",
            F.coalesce(F.col("term"), F.col("qterm")).alias("term"),
            F.coalesce(F.col("df"), F.lit(0)).alias("df"),
        )
    )
    return best.groupBy().agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))), lambda s: s["term"]
            ),
            " ",
        ).alias("suggestion"),
        F.sum("df").cast("long").alias("score"),
    )


# --- retrieval services ----------------------------------------------------

def q_index_stats(spark, sf_dir):
    """_stats / monitoring analogue (reference K9: the river's http
    stat endpoint, river/status.go): per-segment doc counts straight
    from the lineage manifests (no scan) cross-checked against live
    docstore counts — the manifests also carry term_count, n_postings,
    postings_bytes, wall_time (asserted in tests/test_resume.py)."""
    r = index_for(spark, sf_dir)
    rows = [(str(m["segment_id"]), int(m["n_docs"])) for m in r.manifests]
    manifest_df = spark.createDataFrame(rows, "segment string, n_docs long")
    live = r.docstore().groupBy("segment").agg(F.count(F.lit(1)).cast("long").alias("live_docs"))
    return manifest_df.join(live, "segment").orderBy("segment")


def q_get_by_id(spark, sf_dir):
    """get-by-id point lookup (get.go:23; reference verifies docs this
    way: river/river_test.go:275-296)."""
    return _docstore(spark, sf_dir).where(F.col("doc_id") == 42).select(
        "doc_id", "url", "lang", F.length("text").alias("n_chars")
    )


def q_count(spark, sf_dir):
    """count API (count.go:20) — served from the term dictionary, no
    postings decode."""
    from ..query.wand import term_ids

    reader = index_for(spark, sf_dir)
    tid = term_ids(spark, ["dup"])["dup"]
    return reader.global_dict().where(F.col("tid") == tid).select(
        F.col("df").cast("long").alias("n")
    )


def q_sort_top(spark, sf_dir):
    """sort by field desc + deterministic tie-break (sort.go:20-501)."""
    d = _docstore(spark, sf_dir).withColumn("n_chars", F.length("text"))
    return (
        d.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
    )


def q_indices_routing(spark, sf_dir):
    """indices / type routing (search_queries_indices.go:14,
    search_queries_type.go:11): restrict the search to one index
    partition. Segments ARE our index-routing unit (assignment:
    doc_id % n_segments, index/build.py), so the filter is a
    partition-column predicate — no data read outside the target."""
    d = _docstore(spark, sf_dir).where(F.col("segment") == "1")
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_suggest_completion(spark, sf_dir):
    """completion suggester (suggester_completion.go:12): prefix walk
    over the term dictionary, df as weight, top-5 by (weight desc,
    term asc) — the FST-prefix analogue served from term_strings."""
    return (
        _term_dict(spark, sf_dir)
        .where(F.col("term").startswith("s"))
        .select("term", F.col("df").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(5)
    )


def q_missing_lang(spark, sf_dir):
    """`missing` query (search_queries_missing.go:12) — docs with NULL
    lang (the explicit dual of `exists`)."""
    return (
        _docstore(spark, sf_dir)
        .where(F.col("lang").isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_sort_script(spark, sf_dir):
    """script sort (sort.go ScriptSort): order by a computed expression
    — any deterministic column expression slots into the same orderBy
    contract (doc_id tie-break)."""
    d = _docstore(spark, sf_dir)
    return (
        d.select("doc_id", (F.length("text") % 7).alias("skey"))
        .orderBy(F.asc("skey"), F.asc("doc_id"))
        .limit(12)
    )


def q_sort_multi(spark, sf_dir):
    """multi-field sort with missing-value handling (sort.go:20-501:
    field arrays + Missing(...)): lang ASC nulls LAST (missing='_last'),
    then n_chars DESC, doc_id tie-break."""
    d = _docstore(spark, sf_dir).withColumn("n_chars", F.length("text"))
    return (
        d.select("doc_id", "lang", "n_chars")
        .orderBy(F.asc_nulls_last("lang"), F.desc("n_chars"), F.asc("doc_id"))
        .limit(15)
    )


def q_sort_mode(spark, sf_dir):
    """sort array-mode over a multi-valued field (sort.go:20-501
    SortMode min/max/avg/median; Lucene MultiValueMode): the per-doc
    token-length array is the multi-valued carrier. median follows
    Lucene MultiValueMode.MEDIAN (average of the two middles for even
    counts — DuckDB's median/quantile_cont(0.5) matches exactly)."""
    from ..analyzer import tokens_col

    d = _docstore(spark, sf_dir)
    v = F.array_sort(F.transform(tokens_col("text"), lambda t: F.length(t).cast("double")))
    n = F.size(v)
    med = F.when(
        n % 2 == 1, F.element_at(v, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (F.element_at(v, (n / 2).cast("int")) + F.element_at(v, (n / 2 + 1).cast("int"))) / 2.0
    )
    out = d.select(
        "doc_id",
        F.array_min(v).alias("wl_min"),
        F.array_max(v).alias("wl_max"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / n, 6).alias("wl_avg"),
        F.round(med, 6).alias("wl_median"),
        n.alias("_n"),
    ).where(F.col("_n") > 0).drop("_n")
    return out.orderBy(F.desc("wl_median"), F.desc("wl_avg"), F.asc("doc_id")).limit(12)


def q_keyset_page(spark, sf_dir):
    """scroll/scan as keyset pagination (scroll.go:20, scan.go:30):
    page of 20 after doc_id 100, ordered by doc_id."""
    d = _docstore(spark, sf_dir)
    return (
        d.where(F.col("doc_id") > 100)
        .select("doc_id", "lang")
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


_TS = "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id * 17)"

ENTRIES = {
    "term_lang": (q_term_lang, "SELECT doc_id, lang FROM documents WHERE lang = 'de'"),
    "terms_lang": (q_terms_lang, "SELECT doc_id, lang FROM documents WHERE lang IN ('fr','es')"),
    "range_nchars": (
        q_range_nchars,
        "SELECT doc_id, length(text) AS n_chars FROM documents "
        "WHERE length(text) > 100 AND length(text) <= 200",
    ),
    "range_ts": (
        q_range_ts,
        f"SELECT doc_id, strftime({_TS}, '%Y-%m-%d %H:%M:%S') AS ts FROM documents "
        f"WHERE {_TS} >= TIMESTAMP '2024-01-01 00:30:00' AND {_TS} < TIMESTAMP '2024-01-01 01:00:00'",
    ),
    "ids": (q_ids, "SELECT doc_id, lang FROM documents WHERE doc_id IN (3, 141, 468)"),
    "exists_lang": (q_exists, "SELECT count(*)::BIGINT AS n FROM documents WHERE lang IS NOT NULL"),
    "prefix_terms": (
        q_prefix_terms,
        "SELECT term, count(*)::BIGINT AS df FROM (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) "
        "WHERE term LIKE 's%' GROUP BY term",
    ),
    "wildcard_terms": (
        q_wildcard_terms,
        "SELECT term, count(*)::BIGINT AS df FROM (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) "
        "WHERE term LIKE 's%n' GROUP BY term",
    ),
    "regexp_terms": (
        q_regexp_terms,
        "SELECT term, count(*)::BIGINT AS df FROM (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) "
        "WHERE regexp_matches(term, '^[bc].*h$') GROUP BY term",
    ),
    "fuzzy_terms": (
        q_fuzzy_terms,
        "SELECT term, count(*)::BIGINT AS df FROM (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) "
        "WHERE levenshtein(term, 'scann') <= 1 GROUP BY term",
    ),
    "suggest_phrase": (
        q_suggest_phrase,
        """WITH dic AS (SELECT term, count(*)::BIGINT AS df FROM (SELECT doc_id, unnest(list_distinct(
regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) GROUP BY term),
q AS (SELECT * FROM (VALUES (0, 'datx'), (1, 'mergs'), (2, 'zzzqqqxx')) AS t(pos, qterm)),
cand AS (SELECT pos, qterm, term, df FROM q LEFT JOIN dic ON levenshtein(term, qterm) <= 1),
best AS (SELECT pos, coalesce(term, qterm) AS term, coalesce(df, 0) AS df FROM (SELECT *, row_number() OVER (PARTITION BY pos ORDER BY df DESC NULLS LAST, term ASC) AS rn FROM cand) WHERE rn = 1)
SELECT string_agg(term, ' ' ORDER BY pos) AS suggestion, sum(df)::BIGINT AS score FROM best""",
    ),
    "get_by_id": (
        q_get_by_id,
        "SELECT doc_id, 'https://site' || (doc_id % 97) || '.example/page/' || doc_id AS url, "
        "lang, length(text) AS n_chars FROM documents WHERE doc_id = 42",
    ),
    "count_term": (
        q_count,
        "SELECT count(*)::BIGINT AS n FROM (SELECT doc_id FROM (SELECT doc_id, unnest("
        "regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents) "
        "WHERE term = 'dup' GROUP BY doc_id)",
    ),
    "index_stats": (
        q_index_stats,
        "SELECT (doc_id % 2)::VARCHAR AS segment, count(*)::BIGINT AS n_docs, "
        "count(*)::BIGINT AS live_docs FROM documents GROUP BY 1 ORDER BY 1",
    ),
    "indices_routing": (
        q_indices_routing,
        "SELECT count(*)::BIGINT AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id "
        "FROM documents WHERE doc_id % 2 = 1",
    ),
    "suggest_completion": (
        q_suggest_completion,
        "SELECT term, count(*)::BIGINT AS weight FROM (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term FROM documents) "
        "WHERE term LIKE 's%' GROUP BY term ORDER BY weight DESC, term ASC LIMIT 5",
    ),
    "missing_lang": (
        q_missing_lang,
        "SELECT count(*)::BIGINT AS n FROM documents WHERE lang IS NULL",
    ),
    "sort_script": (
        q_sort_script,
        "SELECT doc_id, length(text) % 7 AS skey FROM documents "
        "ORDER BY skey ASC, doc_id ASC LIMIT 12",
    ),
    "sort_multi": (
        q_sort_multi,
        "SELECT doc_id, lang, length(text) AS n_chars FROM documents "
        "ORDER BY lang ASC NULLS LAST, n_chars DESC, doc_id ASC LIMIT 15",
    ),
    "sort_mode": (
        q_sort_mode,
        """WITH v AS (
  SELECT doc_id,
         list_sort(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x)::DOUBLE)) AS wl
  FROM documents
)
SELECT doc_id,
       list_min(wl) AS wl_min,
       list_max(wl) AS wl_max,
       round(list_sum(wl) / len(wl), 6) AS wl_avg,
       round(CASE WHEN len(wl) % 2 = 1 THEN wl[(len(wl) + 1) // 2]
                  ELSE (wl[len(wl) // 2] + wl[len(wl) // 2 + 1]) / 2.0 END, 6) AS wl_median
FROM v WHERE len(wl) > 0
ORDER BY wl_median DESC, wl_avg DESC, doc_id ASC LIMIT 12""",
    ),
    "sort_top": (
        q_sort_top,
        "SELECT doc_id, length(text) AS n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id ASC LIMIT 10",
    ),
    "keyset_page": (
        q_keyset_page,
        "SELECT doc_id, lang FROM documents WHERE doc_id > 100 ORDER BY doc_id LIMIT 20",
    ),
}
