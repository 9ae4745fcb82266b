"""Segmented inverted-index build over a webpages-shaped DataFrame.

Dataflow (SURVEY.md §3.1 "Spark shape"):

    read → extract/select → tokenize (JVM regexp) → posexplode →
    repartition(term, shard) + sort  [the ONE wide shuffle] →
    mapInPandas streaming packer (derives tf/dl/positions from sorted
    runs) → packed posting blocks → parquet shard + manifest

Reference analogues: the bootstrap dump→convert→bulk pipeline
(river/river.go:141-149, canal/dump.go:103-126) becomes a batch job;
the bulk micro-batcher's byte/action thresholds (river/bulker.go:43-101,
config/config.go:43) become block/file sizing; the binlog-position
checkpoint (canal/master.go:16-90) becomes the per-segment manifest —
a segment whose manifest exists is complete and is skipped on re-run
(resume semantics of canal/dump.go:103-126).

Scale notes (the 10^12-doc story):
- Documents are sharded by ``doc_id % n_shards``; every term's posting
  list is split into ≤ n_shards independent sorted sub-lists, so the
  worst head term (df ≈ N) parallelizes across n_shards tasks instead
  of hot-spotting one reducer. n_shards is the knob you raise with
  cluster size (thousands at 10^12 docs).
- Segments partition the doc space (like Lucene segments): each builds
  independently → resumable, incremental (new docs = new segment), and
  bounded task memory regardless of corpus size.
- The only Python in the build is the block packer (Arrow-batched,
  numpy-vectorized); tokenize/explode stay whole-stage-codegen JVM.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..analyzer import BM25_B, BM25_K1, TOKEN_PATTERN, tokens_col
from .codec import BLOCK_SIZE

DEFAULT_SETTINGS = {
    "token_pattern": TOKEN_PATTERN,
    "bm25_k1": BM25_K1,
    "bm25_b": BM25_B,
}


def write_settings(index_dir: str, settings: dict | None) -> dict:
    """Persist per-index analyzer/scoring settings (reference K5:
    <index>.idx.json applied at index creation, river/river.go:82-139).
    Existing settings win — an index's analyzer must never change
    silently under incremental builds."""
    merged = {**DEFAULT_SETTINGS, **(settings or {})}
    path = os.path.join(index_dir, "settings.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    os.makedirs(index_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1)
    os.replace(tmp, path)
    return merged

POSTINGS_SCHEMA = StructType(
    [
        StructField("tid", LongType()),
        StructField("shard", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("first_doc_id", LongType()),
        StructField("last_doc_id", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("max_tf", IntegerType()),
        StructField("min_dl", IntegerType()),
        StructField("sum_tf", LongType()),
        StructField("docs_vb", BinaryType()),
        StructField("tfs_vb", BinaryType()),
        StructField("dls_vb", BinaryType()),
        # per-posting occurrence positions, delta-varbyte with reset at
        # every posting (slice lengths == tfs) — serves match_phrase /
        # phrase_prefix / query_string phrases straight from the index,
        # no docstore re-tokenize at query time
        StructField("pos_vb", BinaryType()),
    ]
)


def segment_dir(index_dir: str, segment_id: int | str) -> str:
    return os.path.join(index_dir, "segments", f"seg={segment_id}")


GEN_POINTER = "index.gen"


def gen_root(index_dir: str) -> str:
    """Current generation root. ``index.gen`` names the live generation
    subdir — compact() builds the next generation to the side and flips
    this pointer atomically (the reference's create-new-index-then-swap
    -alias pattern, river/river.go:111-128), so a reader NEVER sees a
    half-swapped index: either pointer flips (new complete generation)
    or it doesn't (old generation untouched, tombstones included).
    Absent pointer → the index lives at index_dir itself (the layout
    every fresh build produces)."""
    p = os.path.join(index_dir, GEN_POINTER)
    if os.path.exists(p):
        with open(p) as f:
            return os.path.join(index_dir, f.read().strip())
    return index_dir


def _make_stream_packer(block_size: int, n_shards: int | None = None):
    """Streaming per-partition packer for mapInPandas over TOKEN-level
    input sorted by (tid, shard, doc_id, pos). When ``n_shards`` is
    given the input carries no ``shard`` column — the packer derives it
    as ``doc_id % n_shards`` (one numpy op per batch), so the shard key
    never rides the wide shuffle / sort / Arrow boundary (guide §2.3
    "shuffle fewer bytes": 4 of 28 bytes per token row; the build's
    repartition and sort key it as an expression instead).

    Postings are DERIVED here from the sorted runs — tf is the run
    length of (tid, doc_id), positions are the run's pos values, dl
    rides every token row — which is what lets the whole postings job
    run with ONE wide shuffle: the repartition that co-locates each
    (term, shard) sub-list IS the aggregation (a pre-agg stage would
    shuffle every position anyway, so it saved nothing and cost a hash
    aggregate; measured 2x build throughput on removal).

    All numpy: boundaries via change-point detection on the sorted key
    columns, one varbyte encode per column per batch-flush (per-value
    independence lets us slice per-block byte ranges from cumulative
    lengths), block metadata via np.*.reduceat. No pandas groupby, no
    re-sort. Groups spanning Arrow batch boundaries are carried over;
    memory is bounded by (largest single (term, shard) token run + one
    batch), which n_shards keeps small by construction.
    """
    from .codec import delta_encode_segmented, vb_encode_with_lengths

    def pack_region(tid, shard, doc_id, dl, pos, n_tok) -> pd.DataFrame:
        """Pack token rows [0..n_tok) — the region ends exactly at a
        (tid, shard) group boundary."""
        t_, s_ = tid[:n_tok], shard[:n_tok]
        d_, l_, p_ = doc_id[:n_tok], dl[:n_tok], pos[:n_tok]
        # posting boundaries: change of (tid, shard, doc_id)
        chg = np.flatnonzero(
            (t_[1:] != t_[:-1]) | (s_[1:] != s_[:-1]) | (d_[1:] != d_[:-1])
        ) + 1
        p_starts = np.concatenate(([0], chg)).astype(np.int64)
        p_ends = np.concatenate((chg, [n_tok])).astype(np.int64)
        tfs = p_ends - p_starts
        doc_ids = d_[p_starts]
        dls = l_[p_starts]
        g_tid = t_[p_starts]
        g_shard = s_[p_starts]
        # group boundaries in posting space
        gchg = np.flatnonzero((g_tid[1:] != g_tid[:-1]) | (g_shard[1:] != g_shard[:-1])) + 1
        bounds = np.concatenate(([0], gchg, [len(p_starts)])).astype(np.int64)

        out_term, out_shard, out_bid = [], [], []
        starts_all = []
        for gi in range(len(bounds) - 1):
            s, e = bounds[gi], bounds[gi + 1]
            g_starts = np.arange(s, e, block_size)
            starts_all.append(g_starts)
            nb = len(g_starts)
            out_term.append(np.repeat(g_tid[s], nb))
            out_shard.append(np.repeat(g_shard[s], nb))
            out_bid.append(np.arange(nb, dtype=np.int32))
        starts = np.concatenate(starts_all)
        grp_of_start = np.repeat(np.arange(len(bounds) - 1), [len(a) for a in starts_all])
        ends = np.minimum(starts + block_size, np.asarray(bounds[1:])[grp_of_start])
        # delta doc_ids, reset at block starts (block-local decodability)
        deltas = doc_ids.astype(np.uint64).copy()
        deltas[1:] -= doc_ids[:-1].astype(np.uint64)
        deltas[starts] = doc_ids[starts]
        d_bytes, d_lens = vb_encode_with_lengths(deltas)
        t_bytes, t_lens = vb_encode_with_lengths(tfs)
        l_bytes, l_lens = vb_encode_with_lengths(dls)
        d_off = np.concatenate(([0], np.cumsum(d_lens)))
        t_off = np.concatenate(([0], np.cumsum(t_lens)))
        l_off = np.concatenate(([0], np.cumsum(l_lens)))
        dv, tv, lv = memoryview(d_bytes), memoryview(t_bytes), memoryview(l_bytes)
        # positions: the region's token pos stream, deltas resetting at
        # every posting → block slices at posting boundaries stay
        # independently decodable; byte ranges from per-value lengths
        # cumulated at posting starts.
        p_bytes, p_lens = vb_encode_with_lengths(delta_encode_segmented(p_, tfs))
        val_off = np.concatenate(([0], np.cumsum(p_lens)))
        p_off = val_off[np.concatenate((p_starts, [n_tok]))]
        pv = memoryview(p_bytes)
        return pd.DataFrame(
            {
                "tid": np.concatenate(out_term).astype(np.int64),
                "shard": np.concatenate(out_shard).astype(np.int32),
                "block_id": np.concatenate(out_bid),
                "first_doc_id": doc_ids[starts],
                "last_doc_id": doc_ids[ends - 1],
                "n_docs": (ends - starts).astype(np.int32),
                "max_tf": np.maximum.reduceat(tfs, starts).astype(np.int32),
                "min_dl": np.minimum.reduceat(dls, starts).astype(np.int32),
                "sum_tf": np.add.reduceat(tfs, starts).astype(np.int64),
                "docs_vb": [bytes(dv[d_off[a] : d_off[b]]) for a, b in zip(starts, ends)],
                "tfs_vb": [bytes(tv[t_off[a] : t_off[b]]) for a, b in zip(starts, ends)],
                "dls_vb": [bytes(lv[l_off[a] : l_off[b]]) for a, b in zip(starts, ends)],
                "pos_vb": [bytes(pv[p_off[a] : p_off[b]]) for a, b in zip(starts, ends)],
            }
        )

    def pack_stream(batches):
        carry = None  # token arrays of the unfinished tail (tid, shard) group
        for pdf in batches:
            tid = pdf["tid"].to_numpy(dtype=np.int64)
            if n_shards is not None:
                shard = (pdf["doc_id"].to_numpy(dtype=np.int64) % n_shards).astype(np.int32)
            else:
                shard = pdf["shard"].to_numpy()
            doc_id = pdf["doc_id"].to_numpy(dtype=np.int64)
            dl = pdf["dl"].to_numpy(dtype=np.int64)
            pos = pdf["pos"].to_numpy(dtype=np.uint64)
            if carry is not None:
                tid = np.concatenate([carry[0], tid])
                shard = np.concatenate([carry[1], shard])
                doc_id = np.concatenate([carry[2], doc_id])
                dl = np.concatenate([carry[3], dl])
                pos = np.concatenate([carry[4], pos])
            n = len(tid)
            change = np.flatnonzero((tid[1:] != tid[:-1]) | (shard[1:] != shard[:-1])) + 1
            if len(change) == 0:  # whole batch is one group → carry it all
                carry = (tid, shard, doc_id, dl, pos)
                continue
            tail = change[-1]
            yield pack_region(tid, shard, doc_id, dl, pos, tail)
            carry = (tid[tail:n], shard[tail:n], doc_id[tail:n], dl[tail:n], pos[tail:n])
        if carry is not None and len(carry[0]):
            tid, shard, doc_id, dl, pos = carry
            yield pack_region(tid, shard, doc_id, dl, pos, len(tid))

    return pack_stream


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    segment_id: int | str = 0,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    overwrite: bool = False,
    settings: dict | None = None,
    extra_manifest: dict | None = None,
) -> dict | None:
    """Build one index segment; returns its manifest dict.

    ``docs`` must have columns ``doc_id:int64, text:string`` and may
    carry ``url, warc_ts, lang`` (stored in the docstore). Returns None
    (skip) if the segment's manifest already exists and not overwrite —
    the resume path (reference: canal/dump.go:103-126 skips the dump
    when a binlog checkpoint exists).
    """
    seg = segment_dir(index_dir, segment_id)
    manifest_path = os.path.join(seg, "manifest.json")
    if os.path.exists(manifest_path) and not overwrite:
        with open(manifest_path) as f:
            return json.load(f)
    effective = write_settings(index_dir, settings)
    token_pattern = effective["token_pattern"]

    t0 = time.time()
    # Defensive parallelism: a small parquet input arrives as 1-2
    # partitions and would serialize tokenization on one core. At real
    # scale (maxPartitionBytes-sized splits) this branch never fires.
    target_parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, target_parts // 2):
        docs = docs.repartition(target_parts)
    passthrough = [c for c in ("url", "warc_ts", "lang", "text", "_parent") if c in docs.columns]
    base = docs.select(
        "doc_id", *passthrough, tokens_col("text", pattern=token_pattern).alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    _timings: dict[str, float] = {}
    _t = time.time()

    def _mark(name: str) -> None:
        nonlocal _t
        _timings[name] = round(time.time() - _t, 2)
        _t = time.time()

    # Job 1 — docstore write; collection stats ride along via observe()
    # (no separate stats job). Tokenize is recomputed by job 2 instead
    # of persisting token arrays: at scale the cache serialization +
    # memory pressure costs more than the second regex pass.
    from pyspark.sql import Observation

    obs = Observation()
    docstore = base.drop("_toks").observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.min("doc_id").alias("doc_id_min"),
        F.max("doc_id").alias("doc_id_max"),
    )
    docstore.write.mode("overwrite").parquet(os.path.join(seg, "docs.parquet"))
    stats_row = obs.get
    _mark("docstore")

    # Job 2 — postings. ONE explicit-width shuffle co-locating each
    # (term, shard) sub-list, sorted so the streaming packer sees
    # contiguous (tid, shard, doc_id, pos) runs. The width is pinned (AQE would otherwise coalesce the
    # small bench shuffle to 1-2 tasks and serialize the Python stage;
    # at real scale you want it pinned to ~2-3x cluster cores anyway).
    # Output files stay sorted by term → parquet min/max row-group
    # stats make query-time term lookups prunable scans.
    # Terms are keyed by xxhash64 (fixed-width int64) the moment they
    # leave the tokenizer: at web scale the term string would otherwise
    # ride through two shuffles and a sort (memory-bandwidth bound).
    # Query-side hashes its terms the same way; term *strings* are only
    # needed by dictionary-walking ops (prefix/wildcard/fuzzy), served
    # by the lazily-built term_strings table (reader.term_strings()).
    # 64-bit collisions are negligible below ~10^9 distinct terms.
    # posexplode keeps each occurrence's position. TOKEN rows go
    # straight into the co-locating shuffle — no (term, doc) pre-agg
    # stage: positions make the agg's map-side combine worthless (every
    # position ships regardless), so the aggregate hash stage was pure
    # overhead (removing it measured ~2x build throughput). tf/dl/
    # positions are derived from the sorted runs inside the packer.
    exploded = base.select(
        "doc_id", "dl", F.posexplode("_toks").alias("pos", "_tok")
    ).select("doc_id", "dl", F.col("pos").cast("int").alias("pos"), F.xxhash64("_tok").alias("tid"))
    # shard is an EXPRESSION in the partition/sort keys, never a
    # materialized column: the wide shuffle and sort move 24 B/token
    # instead of 28 (guide §2.3); the packer re-derives it from doc_id
    # (same pmod, same int32) — identical layout, ~4% pack-stage wall
    # in the r6 interleaved A/B at local[4], flat at local[1].
    shard_expr = F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    pack_width = max(target_parts, int(spark.conf.get("spark.sql.shuffle.partitions")))
    pack_obs = Observation()
    packed = (
        exploded.repartition(pack_width, F.col("tid"), shard_expr)
        .sortWithinPartitions(F.col("tid"), shard_expr, F.col("doc_id"), F.col("pos"))
        .mapInPandas(_make_stream_packer(block_size, n_shards), schema=POSTINGS_SCHEMA)
        .observe(
            pack_obs,
            F.approx_count_distinct("tid").alias("term_count"),
            F.sum("n_docs").alias("n_postings"),
            F.sum(
                F.length("docs_vb") + F.length("tfs_vb") + F.length("dls_vb")
                + F.length("pos_vb")
            ).alias("postings_bytes"),
        )
    )
    packed.write.mode("overwrite").parquet(os.path.join(seg, "postings.parquet"))
    # manifest term_count is HLL-approximate (observe() cannot run exact
    # distinct); the exact dictionary is derived by IndexReader on first
    # use from block metadata (no third job in the build's hot path).
    term_count = int(pack_obs.get["term_count"])
    _mark("postings")

    # Job 3 — per-segment term dictionary (term, tid, df), VERDICT r3
    # #5: emitted AT BUILD TIME so dictionary-walking ops (prefix/
    # wildcard/fuzzy/suggest) never re-tokenize the docstore at query
    # time, and incremental segments carry their own dictionaries (the
    # old root-level lazy cache went stale when new segments landed).
    # This re-runs the regex tokenize (same tradeoff as job 2: caching
    # token arrays costs more than recomputing them), but the agg's
    # map-side combine reduces each partition to its distinct terms, so
    # the shuffle is dictionary-sized, not corpus-sized. Range-sorted
    # by term → prefix walks prune row groups. df is the segment-build-
    # time count (Lucene semantics: later deletes don't decrement df
    # until the segment merges away).
    term_dict = (
        base.select(F.explode(F.array_distinct("_toks")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .withColumn("tid", F.xxhash64("term"))
    )
    # Layout: sorted-by-term parquet for row-group pruning. Partition
    # count is sized from the exact packer term count — below ~2M terms
    # ONE sorted file via coalesce (repartitionByRange would add a
    # range-SAMPLING pass that re-evaluates the whole tokenize+agg,
    # doubling job 3); big dictionaries take the range shuffle, whose
    # sampling cost is then amortized over real volume.
    dict_parts = max(1, term_count // 2_000_000)
    laid_out = (
        # repartition(1), not coalesce(1): coalesce would collapse the
        # agg's reduce side to one task; this keeps the agg parallel
        # and only the dictionary-sized result funnels to one sorter
        term_dict.repartition(1).sortWithinPartitions("term")
        if dict_parts == 1
        else term_dict.repartitionByRange(dict_parts, "term").sortWithinPartitions("term")
    )
    laid_out.write.mode("overwrite").parquet(os.path.join(seg, "term_dict.parquet"))
    _mark("term_dict")
    nbytes = sum(
        os.path.getsize(os.path.join(r, fn))
        for r, _, fns in os.walk(seg)
        for fn in fns
    )
    manifest = {
        "segment_id": str(segment_id),
        "n_docs": stats_row["n_docs"],
        "sum_dl": int(stats_row["sum_dl"] or 0),
        "doc_id_min": stats_row["doc_id_min"],
        "doc_id_max": stats_row["doc_id_max"],
        "term_count": term_count,
        # exact packed-postings sizing: feeds the query-side byte-based
        # driver-path threshold (estimated pull size, not posting count)
        "n_postings": int(pack_obs.get["n_postings"] or 0),
        "postings_bytes": int(pack_obs.get["postings_bytes"] or 0),
        "bytes": nbytes,
        "n_shards": n_shards,
        "block_size": block_size,
        "wall_time_sec": round(time.time() - t0, 3),
        **(extra_manifest or {}),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path)  # atomic, like canal/master.go:71-90
    if os.environ.get("SPARK_GRAFT_BUILD_TIMING"):
        import sys

        print(f"[build_segment {segment_id}] phases: {_timings}", file=sys.stderr)
    return manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_segments: int = 1,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    settings: dict | None = None,
    template_store: str | None = None,
) -> list[dict]:
    """Partition the doc space into ``n_segments`` and build each.

    Segment assignment is ``doc_id % n_segments`` (deterministic, so a
    killed build resumes with identical segment contents).

    ``template_store``: directory holding ``index_templates.json`` —
    templates whose pattern matches this index's basename merge into
    ``settings`` (explicit keys win; index/templates.py precedence).
    """
    if template_store is not None:
        from .templates import settings_for

        settings = settings_for(
            template_store, os.path.basename(index_dir.rstrip("/")), settings
        )
    manifests = []
    for s in range(n_segments):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(n_segments)) == s) if n_segments > 1 else docs
        manifests.append(
            build_segment(
                spark, part, index_dir, segment_id=s, n_shards=n_shards,
                block_size=block_size, settings=settings,
            )
        )
    return manifests
