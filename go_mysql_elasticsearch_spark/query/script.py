"""Mini script engine: ES inline scripts -> Spark Column + ANSI SQL.

The reference's client attaches ``Script`` objects to queries, sorts,
updates and aggregations (script.go:15-112; consumed by
search_queries_script.go:13, sort.go ScriptSort, update.go:17,
update_by_query.go). ES evaluates them per-document in Groovy/Painless;
here the same expression is PARSED ONCE on the driver and compiled to a
Catalyst Column — so "scripts" run vectorized inside whole-stage
codegen, never per-row Python. The identical parse tree also renders to
ANSI SQL so every scripted operator keeps a DuckDB oracle twin.

Supported grammar (the arithmetic/boolean painless subset the reference
rivers actually use):

    doc['field'].value            field access
    params resolved at parse time (ES Script.Params, script.go:71-75)
    + - * / %  (numeric; / is double division; % takes the DIVIDEND's
                sign — C/Java/SQL semantics, identical in Spark, DuckDB
                and Painless, unlike Python's divisor-sign %)
    == != >= <= > <   && ||   unary -
    abs(x) ln(x) sqrt(x) floor(x) min(x,y) max(x,y)
    numbers, 'string' literals, parentheses

Scale note: compilation is driver-side string work; the emitted Column
is ordinary Catalyst — pushdown/codegen apply as if hand-written.

Integer width contract: all integer arithmetic is pinned to int64.
Both renderers CAST integer field references and integer literals to
64-bit (Spark ``long`` / SQL ``BIGINT``) so the two engines agree —
bare integer literals type as INT32 in DuckDB and ``length()`` returns
INT32 in Spark, so an unpinned product like ``doc_id * doc_id * doc_id``
overflows at 2^31 in one engine but not the other (Hypothesis found
this at doc_id=1291). Behavior beyond int64 is undefined (DuckDB
raises, Spark wraps or raises under ANSI), matching Painless's Java
``long`` limit.
"""

from __future__ import annotations

import re

# (spark_builder, sql_text) per stored/virtual doc field. n_chars is the
# mapping-layer virtual field (river/rule.go field mappings).
_FUNCS = {"abs": 1, "ln": 1, "sqrt": 1, "floor": 1, "min": 2, "max": 2}

_TOKEN_RX = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)|(?P<doc>doc\['[A-Za-z_][A-Za-z_0-9]*'\]\.value)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)|(?P<str>'[^']*')"
    r"|(?P<op>==|!=|>=|<=|&&|\|\||[-+*/%<>(),]))"
)


def _tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RX.match(src, pos)
        if not m or m.end() == m.start():
            rest = src[pos:].strip()
            if not rest:
                break
            raise ValueError(f"bad script at: {rest[:30]!r}")
        out.append(m.group().strip())
        pos = m.end()
    return out


class _Parser:
    """Recursive-descent over the precedence ladder || < && < cmp <
    add < mul < unary < primary."""

    def __init__(self, toks: list[str], params: dict):
        self.toks, self.i, self.params = toks, 0, params or {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, want=None):
        t = self.peek()
        if t is None or (want is not None and t != want):
            raise ValueError(f"expected {want!r}, got {t!r}")
        self.i += 1
        return t

    def parse(self):
        node = self.or_()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_(self):
        n = self.and_()
        while self.peek() == "||":
            self.eat()
            n = ("or", n, self.and_())
        return n

    def and_(self):
        n = self.cmp()
        while self.peek() == "&&":
            self.eat()
            n = ("and", n, self.cmp())
        return n

    def cmp(self):
        n = self.add()
        if self.peek() in ("==", "!=", ">=", "<=", ">", "<"):
            op = self.eat()
            n = ("cmp", op, n, self.add())
        return n

    def add(self):
        n = self.mul()
        while self.peek() in ("+", "-"):
            op = self.eat()
            n = ("bin", op, n, self.mul())
        return n

    def mul(self):
        n = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.eat()
            n = ("bin", op, n, self.unary())
        return n

    def unary(self):
        if self.peek() == "-":
            self.eat()
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of script")
        if t == "(":
            self.eat()
            n = self.or_()
            self.eat(")")
            return n
        if t in _FUNCS:
            name = self.eat()
            self.eat("(")
            args = [self.or_()]
            while self.peek() == ",":
                self.eat()
                args.append(self.or_())
            self.eat(")")
            if len(args) != _FUNCS[name]:
                raise ValueError(f"{name}() takes {_FUNCS[name]} args")
            return ("fn", name, args)
        if t.startswith("doc['"):
            self.eat()
            return ("field", t[5:-8])
        if t.startswith("'"):
            self.eat()
            return ("lit", t[1:-1])
        if re.fullmatch(r"\d+(\.\d+)?", t):
            self.eat()
            return ("lit", float(t) if "." in t else int(t))
        # bare name -> script param (substituted at parse time,
        # script.go:71-75 Params)
        if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", t):
            self.eat()
            if t not in self.params:
                raise ValueError(f"unbound script param: {t}")
            return ("lit", self.params[t])
        raise ValueError(f"unexpected token {t!r}")


def parse_script(src: str, params: dict | None = None):
    return _Parser(_tokenize(src), params or {}).parse()


# --- renderers --------------------------------------------------------------

def to_column(node, fields: dict):
    """Render to a Catalyst Column. ``fields`` maps doc-field name ->
    zero-arg Column builder (virtual fields included)."""
    from pyspark.sql import functions as F

    kind = node[0]
    if kind == "lit":
        v = node[1]
        # int64 contract: int literals compute as long (bool is an int
        # subclass in Python — leave it boolean)
        if isinstance(v, int) and not isinstance(v, bool):
            return F.lit(v).cast("long")
        return F.lit(v)
    if kind == "field":
        if node[1] not in fields:
            raise ValueError(f"unknown doc field: {node[1]}")
        return fields[node[1]]()
    if kind == "neg":
        return -to_column(node[1], fields)
    if kind == "bin":
        op, a, b = node[1], to_column(node[2], fields), to_column(node[3], fields)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a.cast("double") / b.cast("double")
        return a % b
    if kind == "cmp":
        op, a, b = node[1], to_column(node[2], fields), to_column(node[3], fields)
        return {
            "==": a == b, "!=": a != b, ">=": a >= b,
            "<=": a <= b, ">": a > b, "<": a < b,
        }[op]
    if kind == "and":
        return to_column(node[1], fields) & to_column(node[2], fields)
    if kind == "or":
        return to_column(node[1], fields) | to_column(node[2], fields)
    if kind == "fn":
        args = [to_column(a, fields) for a in node[2]]
        return {
            "abs": F.abs, "ln": F.log, "sqrt": F.sqrt, "floor": F.floor,
            "min": F.least, "max": F.greatest,
        }[node[1]](*args)
    raise ValueError(f"bad node: {node}")


def to_sql(node, fields: dict) -> str:
    """Render to dialect-common SQL (valid in both Spark SQL and
    DuckDB). ``fields`` maps doc-field name -> SQL expression text."""
    kind = node[0]
    if kind == "lit":
        v = node[1]
        if isinstance(v, str):
            return f"'{v}'"
        # int64 contract: bare int literals type INT32 in DuckDB —
        # CAST AS BIGINT is dialect-common and pins the width
        if isinstance(v, int) and not isinstance(v, bool):
            return f"CAST({v} AS BIGINT)"
        return repr(v)
    if kind == "field":
        if node[1] not in fields:
            raise ValueError(f"unknown doc field: {node[1]}")
        return fields[node[1]]
    if kind == "neg":
        return f"(- {to_sql(node[1], fields)})"
    if kind == "bin":
        op = node[1]
        a, b = to_sql(node[2], fields), to_sql(node[3], fields)
        if op == "/":
            return f"(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE))"
        return f"({a} {op} {b})"
    if kind == "cmp":
        op = {"==": "=", "!=": "<>"}.get(node[1], node[1])
        return f"({to_sql(node[2], fields)} {op} {to_sql(node[3], fields)})"
    if kind == "and":
        return f"({to_sql(node[1], fields)} AND {to_sql(node[2], fields)})"
    if kind == "or":
        return f"({to_sql(node[1], fields)} OR {to_sql(node[2], fields)})"
    if kind == "fn":
        args = ", ".join(to_sql(a, fields) for a in node[2])
        name = {"min": "least", "max": "greatest"}[node[1]] if node[1] in ("min", "max") else node[1]
        return f"{name}({args})"
    raise ValueError(f"bad node: {node}")


_ASSIGN_RX = re.compile(
    r"^\s*ctx\._source\.(?P<field>[A-Za-z_][A-Za-z_0-9]*)\s*=\s*(?P<expr>.+?)\s*$"
)


def parse_update_script(src: str, params: dict | None = None) -> list[tuple[str, object]]:
    """ES update scripts (update.go:17, update_by_query.go): a ';'-
    separated list of ``ctx._source.<field> = <expr>`` assignments.
    Returns [(field, parsed expr)] in source order — the caller renders
    each expr with to_column() and withColumn()s them onto the doc
    frame, so a scripted update of 10^9 docs is one Catalyst projection,
    not per-row script invocations."""
    out = []
    for stmt in src.split(";"):
        if not stmt.strip():
            continue
        m = _ASSIGN_RX.match(stmt)
        if not m:
            raise ValueError(f"not an assignment: {stmt.strip()[:40]!r}")
        out.append((m.group("field"), parse_script(m.group("expr"), params)))
    if not out:
        raise ValueError("empty update script")
    return out


# Default field bindings for the documents docstore (text/lang stored;
# n_chars is the virtual mapping field). Integer fields carry the int64
# CAST (module contract above) so both engines compute in 64-bit.
def spark_fields():
    from pyspark.sql import functions as F

    return {
        "doc_id": lambda: F.col("doc_id").cast("long"),
        "lang": lambda: F.col("lang"),
        "n_chars": lambda: F.length("text").cast("long"),
    }


SQL_FIELDS = {
    "doc_id": "CAST(doc_id AS BIGINT)",
    "lang": "lang",
    "n_chars": "CAST(length(text) AS BIGINT)",
}
