"""Mini script engine (query/script.py): grammar, precedence, param
binding, and the two renderers staying in lockstep."""

import duckdb
import pytest

from go_mysql_elasticsearch_spark.query.script import (
    SQL_FIELDS,
    parse_script,
    to_sql,
)


def sql_eval(src, params=None, fields=None):
    expr = to_sql(parse_script(src, params), fields or SQL_FIELDS)
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


def test_precedence_and_arithmetic():
    assert sql_eval("1 + 2 * 3") == 7
    assert sql_eval("(1 + 2) * 3") == 9
    assert sql_eval("7 % 3") == 1
    assert sql_eval("-2 + 5") == 3
    assert sql_eval("10 / 4") == 2.5  # double division, documented


def test_boolean_ladder():
    assert sql_eval("1 < 2 && 3 >= 3") is True
    assert sql_eval("1 == 2 || 2 != 2") is False
    assert sql_eval("1 == 1 || 1 / 0 > 0") is True  # || short-circuit irrelevant, just valid


def test_functions():
    assert sql_eval("min(3, 5) + max(3, 5)") == 8
    assert sql_eval("floor(sqrt(10))") == 3
    assert sql_eval("abs(-4)") == 4


def test_params_bound_at_parse_time():
    assert sql_eval("factor * 4", {"factor": 2.5}) == 10.0
    with pytest.raises(ValueError, match="unbound script param"):
        parse_script("factor * 4")


def test_field_resolution():
    assert "length(text)" in to_sql(
        parse_script("doc['n_chars'].value + 1"), SQL_FIELDS
    )
    with pytest.raises(ValueError, match="unknown doc field"):
        to_sql(parse_script("doc['nope'].value"), SQL_FIELDS)


def test_string_literals():
    assert sql_eval("'de' == 'de'") is True


def test_syntax_errors_fail_loud():
    for bad in ("1 +", "min(1)", "doc['x'.value", "1 ** 2", "(1 + 2"):
        with pytest.raises(ValueError):
            parse_script(bad)


def test_column_renderer_matches_sql(spark):
    """Same parse tree, both renderers, same values on a real frame."""
    from pyspark.sql import functions as F

    from go_mysql_elasticsearch_spark.query.script import spark_fields, to_column

    src = "sqrt(doc['n_chars'].value) * f + floor(doc['doc_id'].value / 100)"
    node = parse_script(src, {"f": 2.5})
    df = spark.createDataFrame(
        [(1, "abcd"), (250, "abcdefghij")], "doc_id long, text string"
    )
    got = [
        r["v"]
        for r in df.select(F.round(to_column(node, spark_fields()), 6).alias("v"))
        .orderBy("doc_id")
        .collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT round("
            + to_sql(node, SQL_FIELDS)
            + ", 6) FROM (VALUES (1, 'abcd'), (250, 'abcdefghij')) t(doc_id, text) ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want
