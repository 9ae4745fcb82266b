"""Indices admin API — the remaining ``indices_*`` client namespace
(vendored elastic.v3): exists (indices_exists.go), create
(indices_create.go), delete (indices_delete.go), open/close
(indices_open.go / indices_close.go), refresh (indices_refresh.go),
forcemerge (indices_forcemerge.go / optimize.go), dynamic settings
update (indices_put_settings.go / indices_get_settings.go), mapping
introspection (indices_get_mapping.go), and warmers
(indices_put_warmer.go / indices_get_warmer.go /
indices_delete_warmer.go — the ES 2.x pre-registered warm-up queries,
which map exactly onto this engine's serving-mode residency).

All of these are driver-side metadata operations (bytes, not data);
the only ones that touch executors are create (an empty build),
forcemerge (delegates to the tiered merge), and warm (runs the
registered queries).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from .build import gen_root

CLOSED_MARKER = "closed.marker"
WARMERS_FILE = "warmers.json"

# Settings updatable on an OPEN index. In this engine BM25 parameters
# are query-time (the packed postings store raw tf/dl, scoring happens
# at query), so k1/b are "dynamic" in the ES sense; the analyzer is
# baked into the postings at build time, so changing it on an existing
# index would silently desync query-side analysis from the packed data
# — rejected, exactly as ES rejects analysis changes without a
# close+reindex (indices_put_settings.go dynamic-vs-static split).
DYNAMIC_SETTINGS = {"bm25_k1", "bm25_b"}


class IndexClosedError(RuntimeError):
    pass


def index_exists(index_dir: str) -> bool:
    """indices_exists.go: an index exists iff it has at least one
    committed segment manifest (the commit-point convention)."""
    return bool(
        glob.glob(os.path.join(gen_root(index_dir), "segments", "seg=*", "manifest.json"))
    )


def create_index(spark, index_dir: str, schema: str = "doc_id long, text string",
                 settings: dict | None = None, template_store: str | None = None) -> dict:
    """indices_create.go: create an EMPTY index — settings persisted,
    one zero-doc segment committed so readers open it and serve empty
    results (ES: a fresh index is searchable before the first doc).
    Refuses if the index already exists."""
    from .build import build_index

    if index_exists(index_dir):
        raise ValueError(f"index already exists: {index_dir}")
    empty = spark.createDataFrame([], schema)
    return build_index(
        spark, empty, index_dir, n_segments=1, n_shards=1,
        settings=settings, template_store=template_store,
    )[0]


def delete_index(index_dir: str) -> None:
    """indices_delete.go. Refuses a directory that does not look like
    an index (a typo must not rm -rf arbitrary paths)."""
    if not (index_exists(index_dir) or os.path.isdir(os.path.join(index_dir, "segments"))):
        raise ValueError(f"not an index: {index_dir}")
    shutil.rmtree(index_dir)


def close_index(index_dir: str) -> None:
    """indices_close.go: block reads (marker file; IndexReader refuses
    to open). Data stays on disk — open_index reverses it."""
    with open(os.path.join(index_dir, CLOSED_MARKER), "w") as f:
        f.write("closed\n")


def open_index(index_dir: str) -> None:
    """indices_open.go."""
    p = os.path.join(index_dir, CLOSED_MARKER)
    if os.path.exists(p):
        os.remove(p)


def is_closed(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, CLOSED_MARKER))


def refresh_index(spark, reader):
    """indices_refresh.go analog: visibility of post-open writes is a
    READER property here (an IndexReader pins the segment set it
    opened), so refresh = reopen. Returns a fresh IndexReader over the
    same index dir; the old reader stays valid on its pinned view."""
    from .reader import IndexReader

    return IndexReader(spark, reader.index_dir)


def _tombstones_affect_live(reader) -> bool:
    """True iff any tombstone still targets a live segment (a live
    segment id ≤ some tombstone's upto_seg) — i.e. deleted/updated doc
    versions are physically present and would be expunged by a
    rewrite. Manifest ids + one tiny agg over the tombstone table."""
    from pyspark.sql import functions as F

    t = reader.tombstones()
    if t is None:
        return False
    mx = t.agg(F.max("upto_seg")).collect()[0][0]
    if mx is None:
        return False
    return any(int(m["segment_id"]) <= int(mx) for m in reader.manifests)


def forcemerge(
    spark, index_dir: str, max_num_segments: int = 1, expunge_deletes: bool = True
) -> list[dict]:
    """indices_forcemerge.go / optimize.go: merge the live segments
    down to ``max_num_segments`` via the tiered-merge machinery
    (streaming/incremental.py merge_segments — crash-safe manifest
    supersession, per-merge cost bounded by the segments it touches).
    Greedy smallest-first grouping: each round merges the two smallest
    live segments until the target count is reached.

    ``expunge_deletes`` (ES forcemerge semantics — deletes are expunged
    as part of merging): once at the target count, if tombstones still
    target a live segment the remaining segments are rewritten ONCE
    more so deleted/updated versions stop occupying bytes and stop
    counting in N/avgdl/df. Without it an index already at
    max_num_segments would keep its deletes forever (found by
    tests/test_admin_model.py: physical count never converged to live
    after delete→forcemerge on a 1-segment index)."""
    from ..streaming.incremental import merge_segments
    from .reader import IndexReader

    out: list[dict] = []
    while True:
        reader = IndexReader(spark, index_dir)
        live = sorted(reader.manifests, key=lambda m: m["n_docs"])
        if len(live) <= max_num_segments:
            if expunge_deletes and _tombstones_affect_live(reader):
                out.append(
                    merge_segments(
                        spark, index_dir, [m["segment_id"] for m in live]
                    )
                )
                continue  # re-check: the rewrite makes tombstones inert
            return out
        pair = [live[0]["segment_id"], live[1]["segment_id"]]
        out.append(merge_segments(spark, index_dir, pair))


def put_settings(index_dir: str, changes: dict) -> dict:
    """indices_put_settings.go: update DYNAMIC settings on an open
    index (atomic rewrite of the generation root's settings.json — the
    copy readers resolve first). Static keys (the analyzer) are
    rejected; ES parity notes in DYNAMIC_SETTINGS above."""
    bad = set(changes) - DYNAMIC_SETTINGS
    if bad:
        raise ValueError(f"not dynamically updatable: {sorted(bad)}")
    root = gen_root(index_dir)
    path = os.path.join(root, "settings.json")
    if not os.path.exists(path) and os.path.exists(os.path.join(index_dir, "settings.json")):
        path = os.path.join(index_dir, "settings.json")
    # an index built before settings persistence starts from the same
    # defaults readers assume (get_settings parity — no FileNotFoundError)
    settings = get_settings(index_dir)
    settings.update(changes)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(settings, f, indent=1)
    os.replace(tmp, path)
    return settings


def get_settings(index_dir: str) -> dict:
    """indices_get_settings.go: the effective persisted settings."""
    for base in (gen_root(index_dir), index_dir):
        p = os.path.join(base, "settings.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    from .build import DEFAULT_SETTINGS

    return dict(DEFAULT_SETTINGS)


# Spark SQL type -> ES mapping type (indices_get_mapping.go surface;
# the reference's rule layer maps MySQL types the same way,
# river/rule.go + river/river.go:141-215)
_ES_TYPES = {
    "bigint": "long",
    "int": "integer",
    "smallint": "short",
    "tinyint": "byte",
    "string": "text",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "date",
    "date": "date",
    "binary": "binary",
    "array<float>": "dense_vector",
    "array<double>": "dense_vector",
}


def get_mapping(reader) -> list[tuple[str, str]]:
    """indices_get_mapping.go: (field, es_type) rows for the index's
    stored fields, derived from the docstore schema — the engine's
    mapping IS the schema (schema-on-read parity with S8/S10)."""
    out = []
    for f in reader.docstore().schema.fields:
        if f.name == "segment":
            continue  # reader-internal provenance column
        t = f.dataType.simpleString()
        out.append((f.name, _ES_TYPES.get(t, t)))
    return out


# --- warmers ---------------------------------------------------------------

def put_warmer(index_dir: str, name: str, terms: list[str], mode: str = "or") -> dict:
    """indices_put_warmer.go: register a named warm-up query. Warmers
    were ES 2.x's 'run these searches on refresh so caches are hot';
    this engine's analog runs them after ``open_serving`` so the
    residency, the term-dictionary df memo and the Python scorer
    workers are warm before real traffic."""
    p = os.path.join(index_dir, WARMERS_FILE)
    warmers = get_warmers(index_dir)
    warmers[name] = {"terms": terms, "mode": mode}
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(warmers, f, indent=1, sort_keys=True)
    os.replace(tmp, p)
    return warmers


def get_warmers(index_dir: str) -> dict:
    """indices_get_warmer.go."""
    p = os.path.join(index_dir, WARMERS_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def delete_warmer(index_dir: str, name: str) -> dict:
    """indices_delete_warmer.go."""
    p = os.path.join(index_dir, WARMERS_FILE)
    warmers = get_warmers(index_dir)
    warmers.pop(name, None)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(warmers, f, indent=1, sort_keys=True)
    os.replace(tmp, p)
    return warmers


def warm(spark, reader, k: int = 1) -> int:
    """Run every registered warmer against ``reader`` (tiny k — the
    point is cache population, not results). Returns the number of
    warmers run."""
    from ..query.wand import bm25_topk

    warmers = get_warmers(reader.index_dir)
    for w in warmers.values():
        bm25_topk(spark, reader, w["terms"], k=k, mode=w.get("mode", "or")).collect()
    return len(warmers)


def index_stats_summary(index_dir: str) -> dict:
    """Per-index stats from the committed segment manifests — pure
    metadata, no executor work (cluster_stats.go's per-index shape).

    ``n_docs`` is the PHYSICAL doc count (sum over segment manifests):
    upserted/deleted docs keep counting until a merge GCs their
    segments — exactly Lucene's docs.count-vs-docs.deleted split, where
    the stats API reads segment metadata and liveness is a query-time
    concept (here: tombstone filtering in IndexReader.docstore). After
    forcemerge(max_num_segments=1) physical == live."""
    segs = sorted(
        glob.glob(os.path.join(gen_root(index_dir), "segments", "seg=*", "manifest.json"))
    )
    n_docs = n_bytes = 0
    for p in segs:
        with open(p) as f:
            m = json.load(f)
        n_docs += int(m.get("n_docs", 0))
        n_bytes += int(m.get("bytes", 0))
    return {
        "n_segments": len(segs),
        "n_docs": n_docs,
        "bytes": n_bytes,
        "closed": is_closed(index_dir),
    }


def cluster_health(store_dir: str) -> dict:
    """cluster_health.go: one status line over every index under
    ``store_dir`` (the directory-of-index-dirs "cluster state").

    Status semantics adapted to this engine's durability model:
    **green** = every index has a committed commit point and is open;
    **yellow** = at least one index is administratively closed
    (searchable-after-open, data intact — ES yellow's "functional but
    degraded"); **red** = a directory that looks like an index (has a
    segments/ dir or gen pointer) but NO committed manifest — a
    half-written or corrupted index a reader would refuse.

    Driver-side metadata only: reads manifests, never touches
    executors — at any corpus scale this is O(indices · segments)
    small-file reads, the same cost ES pays against cluster state.
    """
    indices, status = {}, "green"
    for name in sorted(os.listdir(store_dir)) if os.path.isdir(store_dir) else []:
        d = os.path.join(store_dir, name)
        if not os.path.isdir(d):
            continue
        looks_like_index = (
            os.path.isdir(os.path.join(gen_root(d), "segments"))
            or os.path.exists(os.path.join(d, "index.gen"))
        )
        if not looks_like_index:
            continue
        st = index_stats_summary(d)
        if st["n_segments"] == 0:
            st["status"] = "red"
        elif st["closed"]:
            st["status"] = "yellow"
        else:
            st["status"] = "green"
        indices[name] = st
        order = {"green": 0, "yellow": 1, "red": 2}
        if order[st["status"]] > order[status]:
            status = st["status"]
    return {
        "status": status,
        "number_of_indices": len(indices),
        "n_docs": sum(i["n_docs"] for i in indices.values()),
        "indices": indices,
    }


def get_index(spark, index_dir: str, alias_store: str | None = None) -> dict:
    """indices_get.go: the composed GET /{index} response — settings +
    mapping + stats + the aliases pointing at this index. Pure
    composition of the implemented pieces (the client composes the
    same way server-side)."""
    from .aliases import get_aliases
    from .reader import IndexReader

    out = {
        "settings": get_settings(index_dir),
        "mappings": dict(get_mapping(IndexReader(spark, index_dir))),
        "stats": index_stats_summary(index_dir),
        "aliases": [],
    }
    if alias_store:
        tgt = os.path.abspath(index_dir)
        out["aliases"] = sorted(
            a for a, d in get_aliases(alias_store).items() if os.path.abspath(d) == tgt
        )
    return out
