"""Operational-API entries: index aliases (indices_put_alias.go:1,
indices_get_aliases.go:1) and index templates
(indices_put_template.go:1) — the zero-downtime cutover and
settings-by-pattern layers, gated end-to-end through real queries.
"""

from __future__ import annotations

import hashlib
import os

from ..index.aliases import open_alias, put_alias, update_aliases
from ..index.build import build_index
from ..index.reader import IndexReader
from ..index.templates import put_template
from ..query.scoring import bm25_oracle_sql
from ..query.wand import bm25_topk
from ..registry import IDX_CACHE_ROOT, INDEX_FORMAT_VERSION, index_for

ALIAS_TERMS = ["fast", "value"]
# template-applied scoring knobs — flow template → settings.json →
# reader.settings → BM25 kernel, and the oracle scores with the same
TPL_K1, TPL_B = 2.0, 0.5
TPL_TERMS = ["table", "value"]


def _tag(*parts: str) -> str:
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def q_alias_query(spark, sf_dir):
    """Query through an index alias after a zero-downtime cutover
    (indices_put_alias.go, the batched ``_aliases`` actions): the alias
    first points at a decoy index, then ONE atomic action batch
    repoints it to the live corpus index — the search API resolves the
    alias at open, so the result set is the live index's, and a reader
    mid-flight sees either decoy or live, never neither (atomicity
    pytest-asserted under a concurrent-reader thread,
    tests/test_admin.py)."""
    key = os.path.abspath(sf_dir)
    store = os.path.join(IDX_CACHE_ROOT, f"aliasstore-{_tag(key, INDEX_FORMAT_VERSION)}")
    real = index_for(spark, sf_dir).index_dir

    decoy = os.path.join(store, "decoy-idx")
    if not os.path.exists(os.path.join(decoy, "segments")):
        docs = spark.createDataFrame(
            [(0, "decoy doc one"), (1, "decoy doc two")], "doc_id long, text string"
        )
        build_index(spark, docs, decoy, n_segments=1, n_shards=1)

    put_alias(store, "docs_live", decoy)
    # reindex-cutover: repoint in one atomic action batch
    update_aliases(
        store, [("remove", "docs_live", decoy), ("add", "docs_live", real)]
    )
    reader = open_alias(spark, store, "docs_live")
    return bm25_topk(spark, reader, ALIAS_TERMS, k=10, mode="or")


STORED_TPL_SRC = '+{{must}} {{should}} "{{p1}} {{p2}}"'
STORED_TPL_PARAMS = {"must": "data", "should": "table", "p1": "fast", "p2": "scan"}


def q_stored_template_query(spark, sf_dir):
    """Search via a STORED template (put_template.go / get_template.go:
    the template source lives server-side, the search carries only the
    id + params): put → render-by-id → execute through the shared
    query_string grammar. A second put with the same id replaces the
    source (ES upsert semantics), and the delete path is
    pytest-covered in tests/test_admin.py."""
    from ..index.search_templates import put_search_template, render_stored
    from ..query.querystring import query_string_topk

    key = os.path.abspath(sf_dir)
    store = os.path.join(IDX_CACHE_ROOT, f"tplstore-{_tag(key, INDEX_FORMAT_VERSION)}")
    # an earlier decoy source under the same id — the real put replaces it
    put_search_template(store, "hits_tpl", "{{must}}")
    put_search_template(store, "hits_tpl", STORED_TPL_SRC)
    rendered = render_stored(store, "hits_tpl", STORED_TPL_PARAMS)
    return query_string_topk(spark, index_for(spark, sf_dir), rendered, k=10)


def _stored_template_oracle() -> str:
    from ..query.querystring import query_string_oracle_sql, render_template

    return query_string_oracle_sql(
        render_template(STORED_TPL_SRC, STORED_TPL_PARAMS), k=10
    )


def q_template_settings(spark, sf_dir):
    """Index built through a template store (indices_put_template.go):
    two templates match the index name by glob — order 0 sets
    bm25_k1=2.0, order 1 adds bm25_b=0.5 (higher order wins between
    templates; explicit creation settings would override both) — and
    the query scores with the templated parameters end-to-end (reader
    picks them up from the persisted settings.json, K5)."""
    key = os.path.abspath(sf_dir)
    store = os.path.join(IDX_CACHE_ROOT, f"tplstore-{_tag(key, INDEX_FORMAT_VERSION)}")
    put_template(store, "webdocs-base", "tpl-docs-*", {"bm25_k1": TPL_K1}, order=0)
    put_template(store, "webdocs-tune", "tpl-docs-*", {"bm25_b": TPL_B}, order=1)

    from ..analyzer import extract_text_udf
    from ..webpages import webpages

    idx = os.path.join(
        store, f"tpl-docs-{_tag(key, str(TPL_K1), str(TPL_B), INDEX_FORMAT_VERSION)}"
    )
    ingest = webpages(spark, sf_dir).select(
        "doc_id", extract_text_udf("html").alias("text")
    )
    build_index(spark, ingest, idx, n_segments=1, n_shards=4, template_store=store)
    reader = IndexReader(spark, idx)
    assert reader.settings.get("bm25_k1") == TPL_K1  # template reached the index
    assert reader.settings.get("bm25_b") == TPL_B
    return bm25_topk(spark, reader, TPL_TERMS, k=10, mode="or")


# indices_put_settings: dynamic scoring knobs updated AFTER build
DYN_K1, DYN_B = 0.9, 0.3
DYN_TERMS = ["query", "batch"]
# fields present in both the docstore and the oracle's documents view —
# the type mapping is gated over these; build-derived (dl) and
# synthesized (url, warc_ts) fields are pytest-covered
MAPPING_FIELDS = ["doc_id", "lang", "text"]


def q_put_settings_dynamic(spark, sf_dir):
    """Dynamic settings update on a live index
    (indices_put_settings.go): BM25 k1/b are query-time knobs in this
    engine (postings store raw tf/dl), so put_settings takes effect on
    the NEXT reader open with no reindex — the entry updates them after
    the build and the query must score with the updated parameters
    (the oracle uses the same k1/b). Static analyzer settings are
    rejected (ES parity), tests/test_indices.py."""
    from ..analyzer import extract_text_udf
    from ..index.indices import put_settings
    from ..webpages import webpages

    key = os.path.abspath(sf_dir)
    idx = os.path.join(
        IDX_CACHE_ROOT, f"dyn-docs-{_tag(key, INDEX_FORMAT_VERSION)}"
    )
    ingest = webpages(spark, sf_dir).select(
        "doc_id", extract_text_udf("html").alias("text")
    )
    build_index(spark, ingest, idx, n_segments=1, n_shards=4)
    put_settings(idx, {"bm25_k1": DYN_K1, "bm25_b": DYN_B})
    reader = IndexReader(spark, idx)
    assert reader.settings["bm25_k1"] == DYN_K1
    return bm25_topk(spark, reader, DYN_TERMS, k=10, mode="or")


def q_get_mapping(spark, sf_dir):
    """Mapping introspection (indices_get_mapping.go): (field, es_type)
    rows derived from the docstore schema — the engine's mapping IS the
    schema (S8/S10 schema-on-read). The oracle derives the same rows
    from DuckDB's DESCRIBE over the same parquet, so the Spark-type →
    ES-type mapping is value-gated, not asserted by hand."""
    from ..index.indices import get_mapping

    rows = [
        (f, t) for f, t in get_mapping(index_for(spark, sf_dir))
        if f in MAPPING_FIELDS
    ]
    return spark.createDataFrame(
        sorted(rows), "field string, es_type string"
    )


_IN = ", ".join(f"'{f}'" for f in MAPPING_FIELDS)
_GET_MAPPING_SQL = f"""SELECT column_name AS field,
  CASE column_type
    WHEN 'BIGINT' THEN 'long' WHEN 'INTEGER' THEN 'integer'
    WHEN 'VARCHAR' THEN 'text' WHEN 'DOUBLE' THEN 'double'
    WHEN 'TIMESTAMP' THEN 'date' WHEN 'BLOB' THEN 'binary'
    ELSE lower(column_type) END AS es_type
FROM (DESCRIBE documents) WHERE column_name IN ({_IN})
ORDER BY field"""


ENTRIES = {
    "alias_query": (
        q_alias_query,
        bm25_oracle_sql(ALIAS_TERMS, mode="or", k=10),
    ),
    "template_settings": (
        q_template_settings,
        bm25_oracle_sql(TPL_TERMS, mode="or", k=10, k1=TPL_K1, b=TPL_B),
    ),
    "put_settings_dynamic": (
        q_put_settings_dynamic,
        bm25_oracle_sql(DYN_TERMS, mode="or", k=10, k1=DYN_K1, b=DYN_B),
    ),
    "get_mapping": (q_get_mapping, _GET_MAPPING_SQL),
    "stored_template_query": (q_stored_template_query, _stored_template_oracle()),
}
