"""Row→doc conversion parity with the reference's river test scenario
(river/river_test.go:40-47,75-91 table translated; operators T4-T12)."""

import pytest
from pyspark.sql import functions as F

from go_mysql_elasticsearch_spark.sources.rowdoc import (
    Rule,
    convert_rows,
    convert_updates,
    enum_decode,
    set_decode,
)

RULE = Rule(
    pk_cols=["id"],
    field_mapping={"mylist": "mylist,list", "title": "es_title"},
    enum_values={"tenum": ["e1", "e2", "e3"]},
    set_values={"tset": ["a", "b", "c"]},
    parent_col="parent",
)


@pytest.fixture(scope="module")
def river_rows(spark):
    # mirrors the 4 canonical rows of river_test.go:40-47
    return spark.createDataFrame(
        [
            (1, "first article", "c1", "a,b,c", 1, 0b001, 10),
            (2, "second article", "c2", "x,y", 2, 0b011, 10),
            (3, "third article", "c3", "", 3, 0b111, 20),
            (4, "fourth article", "c4", "q", 0, 0b000, 20),
        ],
        "id int, title string, content string, mylist string, tenum int, tset int, parent int",
    )


def test_convert_rows_full(spark, river_rows):
    docs = {r["_id"]: r for r in convert_rows(river_rows, RULE).collect()}
    assert set(docs) == {"1", "2", "3", "4"}
    d1 = docs["1"]
    assert d1["es_title"] == "first article"            # T4 rename
    assert list(d1["mylist"]) == ["a", "b", "c"]         # T6 list split
    assert d1["tenum"] == "e1"                           # T7 enum decode
    assert d1["tset"] == "a"                             # T8 set decode
    assert d1["_parent"] == "10"                         # T11 parent
    assert docs["2"]["tset"] == "a,b"
    assert docs["3"]["tset"] == "a,b,c"
    assert docs["4"]["tenum"] == ""                      # ordinal 0 → ''
    assert docs["4"]["tset"] == ""


def test_null_pk_rows_skipped(spark):
    df = spark.createDataFrame([(None, "x"), (5, "y")], "id int, title string")
    out = convert_rows(df, Rule(pk_cols=["id"]))
    assert [r["_id"] for r in out.collect()] == ["5"]   # converter.go:60-62


def test_composite_pk(spark):
    df = spark.createDataFrame([(1, "a", "v")], "k1 int, k2 string, v string")
    out = convert_rows(df, Rule(pk_cols=["k1", "k2"])).collect()
    assert out[0]["_id"] == "1:a"                        # rule.go:63-82 pk join


def test_update_delta_changed_cols_only(spark, river_rows):
    after = river_rows.withColumn(
        "title", F.when(F.col("id") == 1, "first updated").otherwise(F.col("title"))
    )
    acts = {r["_id"]: r for r in convert_updates(river_rows, after, RULE).collect()}
    assert acts["1"]["action"] == "update"
    assert dict(acts["1"]["doc"]) == {"es_title": "first updated"}   # T5: only changed col
    assert dict(acts["2"]["doc"]) == {}                              # unchanged → empty delta


def test_update_key_change_becomes_delete_insert(spark, river_rows):
    after = river_rows.withColumn(
        "id", F.when(F.col("id") == 2, 99).otherwise(F.col("id"))
    )
    acts = convert_updates(river_rows, after, RULE).collect()
    by_id = {(r["_id"], r["action"]) for r in acts}
    assert ("2", "delete") in by_id      # T12: old key deleted
    assert ("99", "insert") in by_id     # new key inserted


def test_enum_set_decode_units(spark):
    df = spark.createDataFrame([(0,), (1,), (3,)], "v int")
    e = df.select(enum_decode("v", ["e1", "e2", "e3"]).alias("e")).collect()
    assert [r["e"] for r in e] == ["", "e1", "e3"]
    s = df.select(set_decode("v", ["a", "b", "c"]).alias("s")).collect()
    assert [r["s"] for r in s] == ["", "a", "a,b"]


def test_parent_routing_end_to_end(spark, tmp_path):
    """T11 end-to-end (VERDICT r3 #8): _parent extracted by the
    conversion rule survives the index build and is served from the
    docstore — the has_child join key comes from storage."""
    from go_mysql_elasticsearch_spark.index.build import build_index
    from go_mysql_elasticsearch_spark.index.reader import IndexReader
    from go_mysql_elasticsearch_spark.sources.rowdoc import Rule, convert_rows
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [(10, 0, "child of zero"), (11, 1, "child of one")],
        "doc_id long, pid long, text string",
    )
    rule = Rule(pk_cols=["doc_id"], parent_col="pid")
    docs = convert_rows(rows, rule).select("doc_id", "_parent", "text")
    idx = str(tmp_path / "parent_idx")
    build_index(spark, docs, idx, n_segments=1, n_shards=2)
    d = IndexReader(spark, idx).docstore()
    assert "_parent" in d.columns
    got = {(r["doc_id"], r["_parent"]) for r in d.select("doc_id", "_parent").collect()}
    assert got == {(10, "0"), (11, "1")}
