"""M0: analyzer + extractor invariants (BASELINE.json input_hint:
byte-identical extracted text per url)."""

import duckdb
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.analyzer import (
    duckdb_tokens_sql,
    extract_text_bytes,
    extract_text_udf,
    tokens_col,
    wrap_html,
)
from go_mysql_elasticsearch_spark.webpages import doc_id_for_url, webpages

from .conftest import SF_SMALL


def test_wrap_extract_roundtrip_python():
    for t in ["hello world", "a  b", "x < y & z", "", "ümlaut café 123"]:
        normalized = " ".join(t.split())
        assert extract_text_bytes(wrap_html(t, "title")) == normalized


def test_extract_invariant_byte_identical_per_url(spark):
    """extractor(html) == text for every row of the webpages table."""
    wp = webpages(spark, SF_SMALL)
    bad = (
        wp.select("url", "text", extract_text_udf("html").alias("extracted"))
        .where(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0
    assert wp.count() == 500


def test_url_doc_id_roundtrip(spark):
    wp = webpages(spark, SF_SMALL)
    bad = wp.where(doc_id_for_url(F.col("url")) != F.col("doc_id")).count()
    assert bad == 0


def test_tokenizer_parity_with_duckdb(spark):
    sdf = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", tokens_col("text").alias("t"))
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    con = duckdb.connect()
    ddf = con.sql(
        f"SELECT doc_id, {duckdb_tokens_sql('text')} AS t "
        f"FROM '{SF_SMALL}/documents.parquet' ORDER BY doc_id LIMIT 50"
    ).fetchall()
    for (srow, drow) in zip(sdf, ddf):
        assert srow["doc_id"] == drow[0]
        assert list(srow["t"]) == list(drow[1])


def test_tokenizer_edge_cases(spark):
    rows = spark.createDataFrame(
        [("A-B_c 9x",), ("",), ("...",), ("ÉCOLE",)], ["text"]
    ).select(tokens_col("text").alias("t")).collect()
    assert list(rows[0]["t"]) == ["a", "b", "c", "9x"]
    assert list(rows[1]["t"]) == []
    assert list(rows[2]["t"]) == []


def test_analyze_offsets_slice_back_to_tokens(spark):
    """_analyze invariant: lower(text)[start:end] == token for every
    emitted row (offsets computed inside codegen, no UDF)."""
    from go_mysql_elasticsearch_spark.entries.services import q_analyze
    from .conftest import SF_SMALL

    rows = q_analyze(spark, SF_SMALL).collect()
    assert rows, "fixture docs should produce tokens"
    texts = {
        r["doc_id"]: r["text"].lower()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id < 5").collect()
    }
    pos = {}
    for r in rows:
        assert texts[r["doc_id"]][r["start_offset"]:r["end_offset"]] == r["token"]
        assert r["position"] == pos.get(r["doc_id"], 0)
        pos[r["doc_id"]] = r["position"] + 1


def test_source_filter_cols_globs():
    from go_mysql_elasticsearch_spark.entries.services import source_filter_cols

    names = ["doc_id", "url", "warc_ts", "lang", "text", "dl", "segment"]
    assert source_filter_cols(names, ["doc_id", "*l"], ["dl"]) == ["doc_id", "url"]
    assert source_filter_cols(names, None, ["warc_*", "segment"]) == [
        "doc_id", "url", "lang", "text", "dl",
    ]
    assert source_filter_cols(names, ["nope*"], None) == []


def test_analyze_matches_python_reference_exactly(spark):
    """Differential: the codegen offset arithmetic must equal a plain
    re.finditer reference on every corpus doc (token, position, spans)."""
    import re as _re

    from go_mysql_elasticsearch_spark.entries.services import q_analyze
    from .conftest import SF_SMALL

    got = [
        (r["doc_id"], r["position"], r["token"], r["start_offset"], r["end_offset"])
        for r in q_analyze(spark, SF_SMALL).collect()
    ]
    want = []
    for row in (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id < 5").orderBy("doc_id").collect()
    ):
        for pos, m in enumerate(_re.finditer(r"[a-z0-9]+", row["text"].lower())):
            want.append((row["doc_id"], pos, m.group(0), m.start(), m.end()))
    assert got == want
