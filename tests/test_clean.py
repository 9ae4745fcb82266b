"""Corpus-cleaning funnel (pipeline/clean.py) on a planted fixture:
every verdict class hit, precedence respected, cleaned set exact."""

from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.pipeline.clean import classify, clean_corpus

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
REPETITIVE = ("spam ham " * 20).strip()  # 40 tokens, 2 distinct 5-grams

ROWS = [
    (0, LONG),                     # clean (keeper of the dup pair)
    (1, "tiny doc"),               # too_short (2 tokens)
    (2, REPETITIVE),               # too_repetitive
    (3, LONG),                     # exact_dup of 0
    (4, LONG + " unique tail"),    # clean
]


def _cl(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r["doc_id"]: r["verdict"] for r in classify(df).collect()}


def test_verdicts(spark):
    v = _cl(spark)
    assert v == {
        0: "clean",
        1: "too_short",
        2: "too_repetitive",
        3: "exact_dup",
        4: "clean",
    }


def test_clean_corpus_outputs(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    cleaned, stats = clean_corpus(df)
    assert sorted(r["doc_id"] for r in cleaned.collect()) == [0, 4]
    s = stats.collect()[0].asDict()
    assert s == {"total": 5, "n_short": 1, "n_repetitive": 1, "n_exact_dup": 1, "n_clean": 2}


def test_short_precedes_dup(spark):
    """A doc that is both short AND a duplicate counts as short (each
    doc counted once, funnel order)."""
    rows = [(0, "tiny doc"), (1, "tiny doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v = {r["doc_id"]: r["verdict"] for r in classify(df).collect()}
    assert v == {0: "too_short", 1: "too_short"}
