"""Corpus-curation operators: decontamination, exact-substring spans,
PII scrubbing, domain mixing — planted-fixture semantics."""

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.pipeline.curation import (
    decontaminate,
    domain_mix_sample,
    exact_substr_spans,
    pii_scrub,
)


@pytest.fixture(scope="module")
def spark():
    from go_mysql_elasticsearch_spark.session import get_spark

    return get_spark(app_name="test-curation")


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words alpha beta gamma delta epsilon zeta eta theta more"),
            (11, "completely different content with no overlap at all here now"),
            (12, "short doc"),  # fewer than n tokens -> 0 windows, clean
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hit_ngrams"], r["contaminated"])
           for r in decontaminate(corpus, bench, n=8).collect()}
    assert got[10][1] is True and got[10][0] >= 1
    assert got[11] == (0, False)
    assert got[12] == (0, False)


def test_exact_substr_flags_cross_doc_spans(spark):
    span = "one two three four five six seven eight nine ten"
    corpus = spark.createDataFrame(
        [
            (0, f"{span} tail words here"),
            (1, f"lead in {span}"),
            (2, "nothing shared with anything else in this corpus at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in exact_substr_spans(corpus, n=10).collect()}
    assert got[0]["n_dup_windows"] >= 1 and got[1]["n_dup_windows"] >= 1
    assert got[2]["n_dup_windows"] == 0
    assert 0 < got[0]["dup_frac"] <= 1.0


def test_pii_scrub_redacts_all_classes(spark):
    docs = spark.createDataFrame(
        [
            (0, "reach me at jane.doe+x@corp.example.org thanks"),
            (1, "call 555-123-4567 or visit 192.168.1.100 today"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[0]["n_email"] == 1 and "<EMAIL>" in got[0]["scrubbed"]
    assert "jane" not in got[0]["scrubbed"]
    assert got[1]["n_phone"] == 1 and got[1]["n_ipv4"] == 1
    assert "<PHONE>" in got[1]["scrubbed"] and "<IP>" in got[1]["scrubbed"]
    assert "555" not in got[1]["scrubbed"] and "192" not in got[1]["scrubbed"]
    assert got[2]["scrubbed"] == "no pii here"


def test_domain_mix_deterministic_and_rate_shaped(spark):
    pages = spark.createDataFrame(
        [(f"https://h{i % 5}.example/p/{i}",) for i in range(1000)], "url string"
    )
    rates = {0: 0.0, 1: 0.25, 2: 0.5, 3: 1.0}
    a = {(r["host"], r["n_pages"], r["n_kept"]) for r in domain_mix_sample(pages, rates).collect()}
    b = {(r["host"], r["n_pages"], r["n_kept"]) for r in domain_mix_sample(pages, rates).collect()}
    assert a == b  # deterministic
    for host, n_pages, n_kept in a:
        assert 0 <= n_kept <= n_pages
    # rate-0 buckets keep nothing; rate-1 buckets keep everything
    from go_mysql_elasticsearch_spark.pipeline.dedup import h60

    host_bucket = {
        r["h"]: r["b"]
        for r in pages.select(
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("h")
        ).distinct().select("h", F.pmod(h60(F.col("h")), F.lit(4)).alias("b")).collect()
    }
    for host, n_pages, n_kept in a:
        if rates[host_bucket[host]] == 0.0:
            assert n_kept == 0
        if rates[host_bucket[host]] == 1.0:
            assert n_kept == n_pages


def test_domain_mix_pathless_url_keeps_host(spark):
    """A URL with no path (https://example.com) must bucket under its
    real host, not an empty-host catch-all (ADVICE r4)."""
    pages = spark.createDataFrame(
        [("https://example.com",), ("https://example.com/p/1",)], "url string"
    )
    rows = domain_mix_sample(pages, {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}).collect()
    assert len(rows) == 1
    assert rows[0]["host"] == "example.com" and rows[0]["n_pages"] == 2


def test_exact_substr_matches_bruteforce_property(spark):
    """Randomized corpora: the distributed window-hash pipeline must
    agree with a brute-force Python reference on which windows are
    duplicated across docs."""
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]
    n = 6
    for trial in range(3):
        docs_py = {
            d: [rng.choice(vocab) for _ in range(rng.randint(n, 25))] for d in range(12)
        }
        # plant one guaranteed cross-doc span
        span = [rng.choice(vocab) for _ in range(n)]
        docs_py[0] = span + docs_py[0]
        docs_py[1] = docs_py[1] + span
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs_py.items()], "doc_id long, text string"
        )
        got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
               for r in exact_substr_spans(df, n=n).collect()}
        # brute force
        from collections import defaultdict

        where = defaultdict(set)
        wins = {}
        for d, toks in docs_py.items():
            ws = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            wins[d] = ws
            for w in ws:
                where[w].add(d)
        for d, ws in wins.items():
            exp_nw = len(ws)
            exp_dup = sum(1 for w in ws if len(where[w]) >= 2)
            assert got[d] == (exp_nw, exp_dup), (trial, d, got[d], (exp_nw, exp_dup))
