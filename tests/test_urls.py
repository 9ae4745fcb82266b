"""URL canonicalization (pipeline/urls.py): the id-hygiene rules a
webtext pipeline needs before URL-level dedup."""

from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.pipeline.urls import canonicalize_url, host_of

CASES = [
    # (raw, canonical)
    ("https://Example.COM/path", "https://example.com/path"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    (
        "https://example.com/p?utm_source=x&b=2&a=1&fbclid=zz&gclid=q",
        "https://example.com/p?a=1&b=2",
    ),
    ("https://example.com/p?utm_campaign=only", "https://example.com/p"),
    ("HTTPS://EXAMPLE.com/Keep/Case?Q=UpPeR", "https://example.com/Keep/Case?Q=UpPeR"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_canonical_form_is_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://A.example.com:8443/x?q=1",), ("http://b.example.com/",)],
        "url string",
    )
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["a.example.com", "b.example.com"]


def test_tracking_dedup_collapses_variants(spark):
    """The point of the exercise: tracking-param variants of one page
    collapse to one canonical id."""
    variants = [
        "https://example.com/page?utm_source=tw",
        "https://example.com/page?utm_source=fb&utm_medium=social",
        "https://example.com/page#section-2",
        "https://example.com/page/",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = df.select(canonicalize_url(F.col("url")).alias("c")).distinct().count()
    assert n == 1
