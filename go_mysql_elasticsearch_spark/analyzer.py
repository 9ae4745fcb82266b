"""Analyzer: HTML→text extraction and tokenization.

The reference delegates analysis to Elasticsearch, configured by opaque
``<index>.idx.json`` settings files (reference: river/river.go:82-139).
Here the analyzer is explicit and deterministic:

- **Tokenizer**: lowercase + maximal runs of ``[a-z0-9]+``. Implemented
  as a built-in JVM-side expression (``regexp_extract_all``) so the hot
  path stays inside whole-stage codegen — no Python in index build.
  The identical expression exists in DuckDB, which is what makes the
  SQL correctness oracle byte-exact.
- **HTML extractor**: vectorized pandas UDF (Arrow-batched) over the
  ``html: binary`` column. Strips script/style, tags, unescapes
  entities, normalizes whitespace. Inverse of :func:`wrap_html` so the
  per-row invariant ``extract(wrap(text)) == text`` is testable
  byte-identically (BASELINE.json input_hint).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# The single source of truth for tokenization. Keep in sync with
# duckdb_tokens_sql() below — both engines must tokenize identically.
TOKEN_PATTERN = "[a-z0-9]+"

# BM25 parameters (BASELINE.json: k1=1.2, b=0.75).
BM25_K1 = 1.2
BM25_B = 0.75


def tokens_col(text_col: str | Column = "text", pattern: str = TOKEN_PATTERN) -> Column:
    """``array<string>`` of analyzed tokens — pure JVM expression.

    ``pattern`` is the per-index analyzer config (reference K5: opaque
    ``<index>.idx.json`` settings, river/river.go:82-139 — here an
    explicit, persisted token regex)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0))


def duckdb_tokens_sql(expr: str = "text", pattern: str = TOKEN_PATTERN) -> str:
    """DuckDB SQL fragment producing the identical token array."""
    return f"regexp_extract_all(lower({expr}), '{pattern}')"


# ---------------------------------------------------------------------------
# HTML wrap / extract (the M0 per-row invariant)
# ---------------------------------------------------------------------------

_RE_SCRIPT = re.compile(rb"(?is)<(script|style)\b.*?</\1>")
_RE_HEAD = re.compile(rb"(?is)<head\b.*?</head>")
_RE_TAG = re.compile(rb"(?s)<[^>]*>")
_RE_WS = re.compile(r"\s+")


def wrap_html(text: str, title: str = "") -> bytes:
    """Deterministic html wrapper used by the synthetic webpages table."""
    body = _html.escape(text, quote=False)
    t = _html.escape(title, quote=False)
    return (
        f"<html><head><title>{t}</title>"
        f'<style>body{{margin:0}}</style>'
        f'<script>var x=1;</script></head>'
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")


def extract_text_bytes(raw: bytes | None) -> str | None:
    """Pure-python extractor: head/script/style removal, tag strip,
    entity unescape, whitespace normalization."""
    if raw is None:
        return None
    s = _RE_HEAD.sub(b" ", raw)
    s = _RE_SCRIPT.sub(b" ", s)
    s = _RE_TAG.sub(b" ", s)
    txt = _html.unescape(s.decode("utf-8", errors="replace"))
    return _RE_WS.sub(" ", txt).strip()


@F.pandas_udf(StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    """Arrow-batched extractor over ``html: binary``.

    At 100 TB this is the only Python stage of the ingest path; it is
    embarrassingly parallel (per-row, no shuffle) and Arrow-batched, so
    it scales linearly with executor cores.
    """
    return html_bytes.map(extract_text_bytes)
