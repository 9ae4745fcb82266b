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


# --- property: renderer == reference interpreter over random trees ---------

from hypothesis import assume, example, given, settings, strategies as st


def _eval_node(node, env):
    """Reference interpreter for the parse tree (independent of both
    renderers)."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "field":
        return env[node[1]]
    if kind == "neg":
        return -_eval_node(node[1], env)
    if kind == "bin":
        import math

        a, b = _eval_node(node[2], env), _eval_node(node[3], env)
        r = {
            "+": lambda: a + b,
            "-": lambda: a - b,
            "*": lambda: a * b,
            "/": lambda: float(a) / float(b),
            # dividend-sign (C/Java/SQL) modulo — Python's % takes the
            # DIVISOR's sign; both engines and Painless take the
            # dividend's, so the reference must too (hypothesis found
            # this on a negative dividend)
            "%": lambda: math.fmod(a, b) if (a < 0 or b < 0) else a % b,
        }[node[1]]()
        # engine contract is int64 (query/script.py module doc): beyond
        # 2^63 the engines' behavior is undefined (DuckDB raises) while
        # Python is arbitrary-precision — signal the test to discard
        if isinstance(r, int) and not -(2**63) <= r < 2**63:
            raise OverflowError(r)
        return r
    if kind == "cmp":
        a, b = _eval_node(node[2], env), _eval_node(node[3], env)
        return {
            "==": a == b, "!=": a != b, ">=": a >= b,
            "<=": a <= b, ">": a > b, "<": a < b,
        }[node[1]]
    if kind == "and":
        return _eval_node(node[1], env) and _eval_node(node[2], env)
    if kind == "or":
        return _eval_node(node[1], env) or _eval_node(node[2], env)
    if kind == "fn":
        import math

        args = [_eval_node(a, env) for a in node[2]]
        return {
            "abs": lambda x: abs(x),
            "ln": lambda x: math.log(x),
            "sqrt": lambda x: math.sqrt(x),
            "floor": lambda x: math.floor(x),
            "min": lambda x, y: min(x, y),
            "max": lambda x, y: max(x, y),
        }[node[1]](*args)
    raise ValueError(node)


_num = st.integers(min_value=1, max_value=999)


@st.composite
def _arith_expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        choice = draw(st.integers(0, 2))
        if choice == 0:
            return str(draw(_num))
        if choice == 1:
            return "doc['n_chars'].value"
        return "doc['doc_id'].value"
    op = draw(st.sampled_from(["+", "-", "*", "%", "/"]))
    a = draw(_arith_expr(depth=depth + 1))
    b = draw(_arith_expr(depth=depth + 1))
    if op in ("%", "/"):
        b = f"({b} + 1000)"  # keep divisors positive/nonzero
    fn = draw(st.sampled_from([None, "abs", "floor"]))
    e = f"({a} {op} {b})"
    return f"{fn}({e})" if fn else e


@settings(max_examples=60, deadline=None)
@given(_arith_expr(), st.integers(0, 10_000), st.integers(1, 500))
@example(
    # pinned Hypothesis counterexample (round 4): 1291^3 > 2^31 — bare
    # int literals/fields typed INT32 in DuckDB and overflowed where the
    # Spark/interpreter paths computed in 64-bit. Fixed by the int64
    # CAST contract in query/script.py.
    src="(doc['doc_id'].value * (doc['doc_id'].value * doc['doc_id'].value))",
    doc_id=1291,
    n_chars=1,
).via("discovered failure")
def test_duckdb_render_matches_reference_interpreter(src, doc_id, n_chars):
    node = parse_script(src)
    env = {"doc_id": doc_id, "n_chars": n_chars}
    try:
        want = _eval_node(node, env)
    except OverflowError:
        assume(False)  # outside the int64 engine contract
    # field bindings carry the int64 CAST exactly as SQL_FIELDS does
    fields = {
        "doc_id": f"CAST({doc_id} AS BIGINT)",
        "n_chars": f"CAST({n_chars} AS BIGINT)",
    }
    got = duckdb.sql(f"SELECT {to_sql(node, fields)} AS v").fetchone()[0]
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9), (src, env)
