"""URL canonicalization + host analytics for webtext corpora.

A Common-Crawl-style pipeline dedups by URL before it dedups by
content — but raw URLs disagree on case, default ports, fragments,
tracking params and trailing slashes. ``canonicalize_url`` normalizes
all of that as ONE Catalyst expression chain (regexp + array ops,
JVM-side, no Python): the canonical form is the doc key the reference
river derives from the PK (config/rule.go:61-82 — url IS the _id in
this engine's data model, so canonicalization is id hygiene).

Rules (the conservative, reversibility-safe subset):
- scheme and host lowercased; path/query case preserved
- default ports stripped (:80 for http, :443 for https)
- fragment dropped
- tracking params dropped (utm_*, fbclid, gclid), remaining query
  params SORTED (order-insensitive compare), empty query dropped
- trailing slash stripped from non-root paths
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def canonicalize_url(u: Column) -> Column:
    no_frag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.substring(hostport, 1, F.length(hostport) - 3),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.substring(hostport, 1, F.length(hostport) - 4),
        )
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    raw_path = F.when(raw_path == "", "/").otherwise(raw_path)
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - 1),
    ).otherwise(raw_path)
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def host_of(u: Column) -> Column:
    """Registrable host (port stripped, lowercased)."""
    hp = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(hp, ":[0-9]+$", "")


def host_stats(pages: DataFrame, top: int = 10) -> DataFrame:
    """Docs per host, top hosts — the crawl-budget / domain-mix view
    every webtext pipeline starts from. One partial-agg groupBy."""
    return (
        pages.select(host_of(F.col("url")).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
        .orderBy(F.desc("n_pages"), F.asc("host"))
        .limit(top)
    )
