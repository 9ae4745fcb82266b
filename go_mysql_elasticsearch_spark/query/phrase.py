"""match_phrase: conjunctive BM25 + positional adjacency verification.

Reference semantics: vendor/gopkg.in/olivere/elastic.v3/
search_queries_match.go:42-50 (type=phrase). v1 strategy per
SURVEY.md §2.4: AND-mode candidate retrieval over the packed index,
then adjacency verification against the docstore text with a pure JVM
array expression (no positional postings needed; the verify set is
small because conjunctive candidates are selective). Scoring is the
BM25 sum of the constituent terms, as ES does for phrases without
slop boosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import TOKEN_PATTERN, tokens_col
from ..index.reader import IndexReader
from .scoring import ROUND_DIGITS, analyze_query
from .wand import bm25_topk
import re

_TOK = re.compile(TOKEN_PATTERN)


def phrase_words(phrase: str, pattern: str | None = None) -> list[str]:
    """Ordered tokens with duplicates (phrase order matters)."""
    rx = re.compile(pattern) if pattern else _TOK
    return rx.findall(phrase.lower())


def phrase_match_expr(toks_col: str, words: list[str]):
    """JVM expression: token array contains the word sequence adjacently."""
    m = len(words)
    c = toks_col
    conds = " AND ".join(f"{c}[i+{j}] = '{w}'" for j, w in enumerate(words))
    return F.expr(f"size({c}) >= {m} AND exists(sequence(0, size({c}) - {m}), i -> {conds})")


def match_phrase(
    spark: SparkSession, reader: IndexReader, phrase: str, k: int = 10
) -> DataFrame:
    pattern = getattr(reader, "settings", {}).get("token_pattern", TOKEN_PATTERN)
    words = phrase_words(phrase, pattern)
    uniq = list(dict.fromkeys(words))
    if not words:
        return spark.createDataFrame([], "doc_id long, score double")
    candidates = bm25_topk(spark, reader, uniq, k=k, mode="and", return_all=True)
    docs = reader.docstore().select("doc_id", tokens_col("text", pattern=pattern).alias("__pt"))
    verified = (
        candidates.join(docs, "doc_id")
        .where(phrase_match_expr("__pt", words))
        .select("doc_id", "score")
    )
    return verified.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def duckdb_phrase_docs_sql(words: list[str]) -> str:
    """DuckDB CTE body selecting doc_ids containing the phrase (1-based lists)."""
    m = len(words)
    conds = " AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(words))
    return (
        f"SELECT DISTINCT doc_id FROM toks, unnest(range(1, len(t) - {m} + 2)) AS u(i) "
        f"WHERE len(t) >= {m} AND {conds}"
    )
