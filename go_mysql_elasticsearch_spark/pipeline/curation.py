"""Corpus-curation operators a large-scale training-data pipeline runs
between crawling and training — the steps published pipelines (GPT-3 /
PaLM / RefinedWeb / Dolma appendices) document beyond plain dedup:

- **test-set decontamination**: drop/flag training docs that share long
  n-grams with an evaluation benchmark (the GPT-3 "13-gram overlap"
  recipe). At scale: benchmark n-gram hashes are a BROADCAST side
  (benchmarks are tiny vs the corpus); the corpus side is one
  explode + semi-join — no shuffle of corpus text, work ∝ corpus
  n-grams with a map-side broadcast probe.
- **exact-substring duplicate spans** (Lee et al. 2021 ExactSubstr):
  fixed-width token windows hashed and grouped corpus-wide; windows
  appearing in ≥2 docs mark duplicated spans. The groupBy key is a
  60-bit md5 hash → uniform shuffle; this is the canonical
  "suffix-array dedup" approximation that actually distributes.
- **PII scrubbing**: regex redaction (emails / phone numbers / IPv4)
  as pure-Catalyst ``regexp_replace`` chains — JVM codegen, no UDF —
  with per-class match counts for audit.
- **domain mixture sampling**: deterministic per-host sampling to hit
  a target mixture (DoReMi/Pile-style reweighting) via md5 hash
  buckets — reproducible across runs and engines, no RNG state.

All hashes are the md5 ``h60`` recipe so every operator has a
bit-identical DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from .dedup import h60

# ---------------------------------------------------------------------------
# n-gram windows (shared by decontamination + exact-substring dedup)
# ---------------------------------------------------------------------------


def ngram_windows_col(text_col: str = "text", n: int = 8) -> F.Column:
    """All order-sensitive token n-gram windows (stride 1, WITH
    duplicates — window multiplicity matters for span accounting)."""
    t = tokens_col(text_col)
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])
    return F.transform(idx, gram)


def _ngram_sql(n: int) -> str:
    """DuckDB expression for the same window list (1-based arrays)."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len(t) >= {n} THEN list_transform(range(1, len(t) - {n} + 2), "
        f"i -> {joined}) ELSE [] END"
    )


# ---------------------------------------------------------------------------
# test-set decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Per-doc contamination report: (doc_id, n_hit_ngrams, contaminated)
    for every corpus doc, where a hit is an n-gram (hashed h60) that
    also occurs in the benchmark. The benchmark n-gram set is tiny →
    broadcast; the corpus side never shuffles its text."""
    bench = (
        benchmark.select(F.explode(ngram_windows_col(n=n)).alias("g"))
        .select(h60(F.col("g")).alias("gh"))
        .distinct()
    )
    grams = corpus.select(
        "doc_id", F.explode_outer(ngram_windows_col(n=n)).alias("g")
    ).select("doc_id", h60(F.col("g")).alias("gh"))
    hits = (
        grams.join(F.broadcast(bench), "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )
    docs = corpus.select("doc_id")
    return (
        docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("long").alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(bench_where: str, corpus_where: str = "", n: int = 8) -> str:
    h = "cast(('0x' || substr(md5(g), 1, 15)) AS BIGINT)"
    return f"""WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents {corpus_where}
),
bench AS (
  SELECT DISTINCT {h} AS gh FROM (
    SELECT unnest({_ngram_sql(n)}) AS g
    FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents {bench_where})
  )
),
grams AS (
  SELECT doc_id, {h} AS gh FROM (
    SELECT doc_id, unnest({_ngram_sql(n)}) AS g FROM tk
  )
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hit_ngrams FROM grams
  WHERE gh IN (SELECT gh FROM bench) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n_hit_ngrams, 0)::BIGINT AS n_hit_ngrams,
       coalesce(h.n_hit_ngrams, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents {corpus_where}) d
LEFT JOIN hits h USING (doc_id)"""


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (ExactSubstr approximation)
# ---------------------------------------------------------------------------


def exact_substr_spans(corpus: DataFrame, n: int = 10) -> DataFrame:
    """Per-doc duplicated-span report: windows of ``n`` tokens whose
    hash occurs in MORE THAN ONE doc corpus-wide. Returns
    (doc_id, n_windows, n_dup_windows, dup_frac). One explode +
    groupBy-on-hash + semi-join — each stage shuffles on a uniform
    60-bit key, never on text."""
    wins = corpus.select(
        "doc_id", F.explode_outer(ngram_windows_col(n=n)).alias("g")
    ).select("doc_id", h60(F.col("g")).alias("gh"))
    dup_hashes = (
        wins.where(F.col("gh").isNotNull())
        .groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    flagged = wins.join(dup_hashes, "gh", "left_semi")
    per_doc = (
        wins.where(F.col("gh").isNotNull())
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
    )
    dup_per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_windows")
    )
    docs = corpus.select("doc_id")
    return (
        docs.join(per_doc, "doc_id", "left")
        .join(dup_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup_windows", F.lit(0))
                / F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def exact_substr_sql(n: int = 10, where: str = "") -> str:
    h = "cast(('0x' || substr(md5(g), 1, 15)) AS BIGINT)"
    return f"""WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents {where}
),
wins AS (
  SELECT doc_id, {h} AS gh FROM (
    SELECT doc_id, unnest({_ngram_sql(n)}) AS g FROM tk
  )
),
dup AS (SELECT gh FROM wins GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
per_doc AS (SELECT doc_id, count(*)::BIGINT AS n_windows FROM wins GROUP BY doc_id),
dup_per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_windows FROM wins
  WHERE gh IN (SELECT gh FROM dup) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_windows, 0)::BIGINT AS n_windows,
       coalesce(x.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       round(coalesce(x.n_dup_windows, 0) / greatest(coalesce(p.n_windows, 0), 1)::DOUBLE, 6) AS dup_frac
FROM (SELECT doc_id FROM documents {where}) d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN dup_per_doc x USING (doc_id)"""


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}
PII_TOKENS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses, counting matches
    per class for audit. Pure Catalyst regexp chains (whole-stage
    codegen; at 100 TB this runs inside the scan projection, no
    shuffle). Returns (doc_id, scrubbed, n_email, n_phone, n_ipv4)."""
    out = docs.select("doc_id", F.col(text_col).alias("_s"))
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all("_s", F.lit(pat), F.lit(0))).cast("long"),
        ).withColumn("_s", F.regexp_replace("_s", pat, PII_TOKENS[name]))
    return out.select(
        "doc_id", F.col("_s").alias("scrubbed"), "n_email", "n_phone", "n_ipv4"
    )


# ---------------------------------------------------------------------------
# duplicate-unit removal (C4 / Dolma line-level dedup, sentence units)
# ---------------------------------------------------------------------------

UNIT_SEP = r"\. "  # sentence units; web pipelines use newline units


def dedup_units(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """C4-style duplicate-line removal at sentence granularity (the
    fixture corpus has no newlines; the published pipelines — C4
    §2.2, Dolma — drop any LINE occurring ≥3 (C4) or ≥2 times in the
    corpus; the unit separator is a parameter of the same shape).
    Returns (doc_id, n_units, n_dup_units, cleaned) where ``cleaned``
    re-joins only the units whose corpus-wide count < min_count.

    Spark shape at 100 TB: posexplode(units) → groupBy(h60(unit))
    count (uniform 60-bit keys, map-side combined) → join back →
    groupBy(doc_id) ordered re-assembly. Two shuffles, both on uniform
    keys; text travels once."""
    units = docs.select(
        "doc_id", F.posexplode(F.split("text", UNIT_SEP)).alias("pos", "u")
    ).where(F.length("u") > 0)
    counts = units.groupBy(h60(F.col("u")).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tagged = units.withColumn("h", h60(F.col("u"))).join(counts, "h")
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum((F.col("n") >= min_count).cast("long")).alias("n_dup_units"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("n") < min_count, F.struct("pos", "u"))
                        )
                    ),
                    lambda s: s["u"],
                ),
                ". ",
            ).alias("cleaned"),
        )
    )


def dedup_units_sql(table: str = "documents", min_count: int = 2) -> str:
    """DuckDB twin — same h60 unit hash, same ordered re-assembly."""
    h = "cast(('0x' || substr(md5(u), 1, 15)) AS BIGINT)"
    return f"""WITH units AS (
  SELECT doc_id, pos, u FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\. ')) AS u,
           generate_subscripts(regexp_split_to_array(text, '\\. '), 1) AS pos
    FROM {table}
  ) WHERE length(u) > 0
),
cnt AS (SELECT {h} AS hh, count(*)::BIGINT AS n FROM units GROUP BY 1)
SELECT doc_id, count(*)::BIGINT AS n_units,
       sum(CASE WHEN n >= {min_count} THEN 1 ELSE 0 END)::BIGINT AS n_dup_units,
       coalesce(string_agg(CASE WHEN n < {min_count} THEN u END, '. ' ORDER BY pos), '') AS cleaned
FROM units JOIN cnt ON {h} = hh
GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# domain mixture sampling
# ---------------------------------------------------------------------------


def domain_mix_sample(
    pages: DataFrame, rates: dict[int, float], n_buckets: int = 4
) -> DataFrame:
    """Deterministic per-domain downsampling to a target mixture: each
    host falls in a bucket (md5 of host % n_buckets); a page is kept
    iff md5(url) lands under the bucket's rate. No RNG state — the
    same page always gets the same verdict, across runs AND engines
    (the reproducibility property DoReMi-style mixture tuning needs).
    Returns per-host (host, bucket, n_pages, n_kept)."""
    # no trailing slash in the host regex: a path-less URL
    # (https://example.com) must still yield its real host, not lump
    # into one empty-host bucket with an arbitrary rate
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    bucket = F.pmod(h60(host), F.lit(n_buckets))
    rate_expr = F.coalesce(*[F.when(bucket == b, F.lit(r)) for b, r in rates.items()], F.lit(1.0))
    kept = (F.pmod(h60(F.col("url")), F.lit(10_000)) < rate_expr * 10_000).cast("int")
    return (
        pages.select(host.alias("host"), bucket.alias("bucket"), kept.alias("kept"))
        .groupBy("host", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )
