"""ES JSON query-DSL -> AST compiler.

The reference ships queries to Elasticsearch as JSON bodies — every
builder in the vendored client renders to exactly this wire shape via
``Source()`` (search_queries_bool.go:84-120, search_queries_match.go:157,
search_queries_fsq.go:93, search_queries_not.go:34,
search_queries_missing.go:55), and RawStringQuery
(search_queries_raw_string.go:13) lets callers hand the engine a raw
JSON string directly. This module is the engine-side decoder: it parses
that same JSON dialect into the query AST (query/ast.py), so a user of
the reference can send the body they send today and get the same
semantics — compiled to the scored-DataFrame algebra instead of Lucene.

Scale note: compilation is driver-side string work on a few-KB body;
everything heavy stays in the compiled plan.
"""

from __future__ import annotations

from . import ast as A
from .scoring import analyze_query

_RANGE_KEYS = ("gte", "lte", "gt", "lt")


def _one_entry(obj: dict) -> tuple[str, object]:
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"expected a single-key query object, got: {obj!r}")
    return next(iter(obj.items()))


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


def _match(field: str, spec) -> A.Query:
    """match / match_phrase (search_queries_match.go:16-214): value is
    either the bare query text or an options object with operator /
    minimum_should_match / type."""
    if not isinstance(spec, dict):
        spec = {"query": spec}
    text = str(spec["query"])
    if spec.get("type") == "phrase":
        return A.Phrase(text)
    terms = tuple(analyze_query(text))
    mode = str(spec.get("operator", "or")).lower()
    msm = int(spec.get("minimum_should_match", 1))
    if field != "text":
        raise ValueError(f"full-text field not indexed: {field}")
    return A.Match(terms, mode=mode, min_should=msm)


def _function(fobj: dict):
    """One entry of function_score.functions
    (search_queries_fsq_score_funcs.go): weight / random_score /
    field_value_factor / exp|gauss|linear decay."""
    fobj = dict(fobj)
    fobj.pop("filter", None)  # per-function filters not supported
    kind, spec = _one_entry(fobj)
    if kind == "weight":
        return A.Weight(float(spec))
    if kind == "random_score":
        return A.RandomScore(seed=int((spec or {}).get("seed", 0)))
    if kind == "field_value_factor":
        return A.FieldValueFactor(
            spec["field"],
            factor=float(spec.get("factor", 1.0)),
            modifier=str(spec.get("modifier", "none")),
            missing=float(spec.get("missing", 1.0)),
        )
    if kind in ("exp", "gauss", "linear"):
        field, dspec = _one_entry(spec)
        return A.Decay(
            field, float(dspec["origin"]), float(dspec["scale"]), kind=kind
        )
    raise ValueError(f"unknown score function: {kind}")


def compile_dsl(body: dict) -> A.Query:
    """Compile one ES query-DSL object into an AST node. Raises
    ValueError on unknown query types — fail loud, never guess."""
    kind, spec = _one_entry(body)

    if kind == "match":
        field, mspec = _one_entry(spec)
        return _match(field, mspec)
    if kind == "match_phrase":  # ES 5 spelling; v3 emits match+type=phrase
        field, mspec = _one_entry(spec)
        if isinstance(mspec, dict):
            mspec = dict(mspec, type="phrase")
        else:
            mspec = {"query": mspec, "type": "phrase"}
        return _match(field, mspec)
    if kind == "match_all":
        return A.MatchAll(boost=float((spec or {}).get("boost", 1.0)))
    if kind == "term":
        field, tspec = _one_entry(spec)
        return A.Term(field, tspec["value"] if isinstance(tspec, dict) else tspec)
    if kind == "terms":
        field, values = _one_entry(spec)
        return A.Terms(field, tuple(values))
    if kind == "ids":  # search_queries_ids.go:12 — doc_id value set
        return A.Terms("doc_id", tuple(spec["values"]))
    if kind == "range":
        field, rspec = _one_entry(spec)
        kw = {k: rspec[k] for k in _RANGE_KEYS if k in rspec}
        return A.Range(field, **kw)
    if kind == "exists":
        return A.Exists(spec["field"])
    if kind == "missing":  # search_queries_missing.go:55 (ES 2.x only)
        return A.Not(A.Exists(spec["field"]))
    if kind == "bool":
        return A.Bool(
            must=tuple(compile_dsl(q) for q in _as_list(spec.get("must", []))),
            should=tuple(compile_dsl(q) for q in _as_list(spec.get("should", []))),
            must_not=tuple(compile_dsl(q) for q in _as_list(spec.get("must_not", []))),
            filter=tuple(compile_dsl(q) for q in _as_list(spec.get("filter", []))),
            minimum_should_match=int(spec.get("minimum_should_match", 0)),
        )
    if kind == "constant_score":
        return A.ConstantScore(
            compile_dsl(spec["filter"]), boost=float(spec.get("boost", 1.0))
        )
    if kind == "dis_max":
        return A.DisMax(
            tuple(compile_dsl(q) for q in spec["queries"]),
            tie_breaker=float(spec.get("tie_breaker", 0.0)),
        )
    if kind == "boosting":
        return A.Boosting(
            compile_dsl(spec["positive"]),
            compile_dsl(spec["negative"]),
            negative_boost=float(spec.get("negative_boost", 0.5)),
        )
    if kind == "not":  # search_queries_not.go:34
        inner = spec.get("query", spec) if isinstance(spec, dict) else spec
        return A.Not(compile_dsl(inner))
    if kind == "function_score":
        return A.FunctionScore(
            compile_dsl(spec.get("query", {"match_all": {}})),
            tuple(_function(f) for f in spec["functions"]),
            score_mode=str(spec.get("score_mode", "multiply")),
            boost_mode=str(spec.get("boost_mode", "multiply")),
        )
    raise ValueError(f"unsupported query type: {kind}")


def raw_string_topk(spark, reader, body_json: str, k: int = 10):
    """RawStringQuery (search_queries_raw_string.go:13-26): parse the
    JSON body and execute through the standard AST top-k path."""
    import json

    return A.topk(spark, reader, compile_dsl(json.loads(body_json)), k=k)
