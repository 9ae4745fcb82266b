"""Text analysis: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All pure Catalyst expressions
(JVM-side, no Python) with exact DuckDB-SQL twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col

STOPWORDS = ["the", "a", "of", "and", "to"]  # n-gram-free heuristic base


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-density language heuristic: en if ≥5% of tokens are
    English stopwords, else 'unk'. (A real n-gram model plugs into the
    same shape: per-doc token stats → argmax score.)"""
    t = tokens_col("text")
    stop_n = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    ratio = stop_n / F.greatest(F.size(t), F.lit(1)).cast("double")
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.05, "en").otherwise("unk").alias("pred_lang"),
        F.round(ratio, 6).alias("stop_ratio"),
    )


NGRAM_N = 5
BOILERPLATE_TOP = 10


def ngrams_col(t, n: int):
    """Array of n-gram span strings from a token array. Guarded for
    short docs: Spark's sequence(1, 0) DESCENDS ([1, 0]), so the
    enumeration must collapse to an empty array when size < n."""
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_ngrams(docs: DataFrame, n: int = NGRAM_N, top: int = BOILERPLATE_TOP) -> DataFrame:
    """Corpus-boilerplate detection — the C4/RefinedWeb preprocessing
    step adapted to this data model: the n-gram SPANS shared by the
    most documents are boilerplate candidates (headers, footers, nav
    chrome in real webtext). Per-doc n-grams come from array slices of
    the analyzed tokens (pure Catalyst — sequence → transform → slice,
    no Python), deduped per doc, then one document-frequency groupBy.

    Scale shape: n-gram explosion multiplies the token stream by ~n;
    the df groupBy partial-aggregates map-side and the top-k is a
    TakeOrdered — never a global sort of the gram space."""
    t = tokens_col("text")
    grams = ngrams_col(t, n)
    per_doc = docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("gram"))
        .limit(top)
    )


def boilerplate_sql(tokens_sql: str, n: int = NGRAM_N, top: int = BOILERPLATE_TOP) -> str:
    """DuckDB twin: 1-based INCLUSIVE list slices t[i:i+n-1]."""
    return f"""WITH tk AS (SELECT doc_id, {tokens_sql} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS gram
  FROM tk, unnest(range(1, greatest(len(t) - {n - 2}, 1))) u(i)
),
df_ AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
SELECT gram, cast(df AS BIGINT) AS df FROM df_
ORDER BY df DESC, gram ASC LIMIT {top}"""


def repetition_scores(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """Intra-document repetition (the RefinedWeb `dup_ngram_frac`
    quality signal): 1 − distinct_ngrams/total_ngrams per doc — high
    values flag spam/generated text that exact- and near-dedup both
    miss because the doc only repeats ITSELF. Pure Catalyst array
    arithmetic, no shuffle at all (per-row projection)."""
    t = tokens_col("text")
    grams = ngrams_col(t, n)
    total = F.size(grams)
    return docs.select(
        "doc_id",
        total.cast("long").alias("n_ngrams"),
        F.round(
            F.when(
                total > 0,
                1.0 - F.size(F.array_distinct(grams)) / total.cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("dup_ngram_frac"),
    )


def repetition_sql(tokens_sql: str, n: int = NGRAM_N) -> str:
    return f"""WITH tk AS (SELECT doc_id, {tokens_sql} AS t FROM documents),
g AS (
  SELECT doc_id,
         [array_to_string(t[i:i+{n - 1}], ' ')
          FOR i IN range(1, greatest(len(t) - {n - 2}, 1))] AS grams
  FROM tk
)
SELECT doc_id, cast(len(grams) AS BIGINT) AS n_ngrams,
       round(CASE WHEN len(grams) > 0
             THEN 1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE
             ELSE 0.0 END, 6) AS dup_ngram_frac
FROM g"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword / digit heuristics → [0,1] score
    (the classic webtext quality gate shape)."""
    t = tokens_col("text")
    n_tok = F.size(t)
    n_char = F.length("text")
    avg_tok_len = F.when(n_tok > 0, (n_char - n_tok + 1) / n_tok.cast("double")).otherwise(0.0)
    stop_ratio = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / F.greatest(n_tok, F.lit(1)).cast("double")
    digit_ratio = (F.length(F.regexp_replace("text", "[^0-9]", "")) / F.greatest(n_char, F.lit(1)).cast("double"))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
    quality = 0.4 * len_ok + 0.3 * F.least(stop_ratio * 10, F.lit(1.0)) + 0.3 * (1 - digit_ratio)
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(avg_tok_len, 6).alias("avg_tok_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens vs BPE-ish subword-regex tokens
    (letters-run | digits-run | single non-space)."""
    ws = F.size(F.split(F.trim("text"), r"\s+"))
    bpe = F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
    return docs.select(
        "doc_id", ws.cast("long").alias("ws_tokens"), bpe.cast("long").alias("bpe_tokens")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint: fold over tokens of
    (acc*131 + h28(token)) mod 2^31 — md5-derived so the SQL oracle is
    bit-identical; order-sensitive (permutation-distinct docs differ)."""
    t = tokens_col("text")
    tok_h = lambda x: F.conv(F.substring(F.md5(x), 1, 7), 16, 10).cast("long")
    fp = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: F.pmod(acc * 131 + tok_h(x), F.lit(2**31))
    )
    return docs.select("doc_id", fp.alias("fp"))


LANG_ID_SQL = """
SELECT doc_id,
       CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'unk' END AS pred_lang,
       round(stop_ratio, 6) AS stop_ratio
FROM (
  SELECT doc_id,
         len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                         x -> x IN ('the','a','of','and','to')))
         / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1)::DOUBLE AS stop_ratio
  FROM documents
)"""

QUALITY_SQL = """
SELECT doc_id, n_tokens::BIGINT AS n_tokens, round(avg_tok_len, 6) AS avg_tok_len,
       round(stop_ratio, 6) AS stop_ratio, round(digit_ratio, 6) AS digit_ratio,
       round(0.4 * len_ok + 0.3 * least(stop_ratio * 10, 1.0) + 0.3 * (1 - digit_ratio), 6) AS quality
FROM (
  SELECT doc_id,
         len(t) AS n_tokens,
         CASE WHEN len(t) > 0 THEN (length(text) - len(t) + 1) / len(t)::DOUBLE ELSE 0.0 END AS avg_tok_len,
         len(list_filter(t, x -> x IN ('the','a','of','and','to'))) / greatest(len(t), 1)::DOUBLE AS stop_ratio,
         length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1)::DOUBLE AS digit_ratio,
         CASE WHEN len(t) >= 10 AND len(t) <= 1000 THEN 1.0 ELSE 0.0 END AS len_ok
  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)
)"""

TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS bpe_tokens
FROM documents"""

FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                          x -> cast(('0x' || substr(md5(x), 1, 7)) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 2147483648
       ) AS fp
FROM documents"""
