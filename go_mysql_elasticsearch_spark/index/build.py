"""Segmented inverted-index build over a webpages-shaped DataFrame.

Dataflow (SURVEY.md §3.1 "Spark shape"):

    read → extract/select → tokenize (JVM regexp) → explode →
    groupBy(term, doc_id) tf  [shuffle 1, map-side partial agg] →
    applyInPandas over (term, shard) → packed posting blocks  [shuffle 2]
    → parquet shard + manifest

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
  numpy-vectorized); tokenize/tf/agg are whole-stage-codegen JVM.
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

from ..analyzer import tokens_col
from .codec import BLOCK_SIZE, pack_block

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
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
    ]
)


def segment_dir(index_dir: str, segment_id: int | str) -> str:
    return os.path.join(index_dir, "segments", f"seg={segment_id}")


def _make_packer(block_size: int):
    def pack_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        rows = []
        for b0 in range(0, len(doc_ids), block_size):
            d = doc_ids[b0 : b0 + block_size]
            t = tfs[b0 : b0 + block_size]
            l = dls[b0 : b0 + block_size]
            docs_vb, tfs_vb, dls_vb = pack_block(d, t, l)
            rows.append(
                (
                    term,
                    shard,
                    b0 // block_size,
                    int(d[0]),
                    int(d[-1]),
                    len(d),
                    int(t.max()),
                    int(l.min()),
                    int(t.sum()),
                    docs_vb,
                    tfs_vb,
                    dls_vb,
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

    return pack_group


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    segment_id: int | str = 0,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    overwrite: bool = False,
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

    t0 = time.time()
    passthrough = [c for c in ("url", "warc_ts", "lang", "text") if c in docs.columns]
    base = docs.select("doc_id", *passthrough, tokens_col("text").alias("_toks")).withColumn(
        "dl", F.size("_toks")
    )

    # --- docstore (doc_id, dl, passthrough cols) ---------------------------
    docstore = base.drop("_toks")
    docstore.write.mode("overwrite").parquet(os.path.join(seg, "docs.parquet"))

    # --- postings ----------------------------------------------------------
    exploded = base.select("doc_id", "dl", F.explode("_toks").alias("term"))
    tf = exploded.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").alias("dl")
    )
    sharded = tf.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    packed = sharded.groupBy("term", "shard").applyInPandas(
        _make_packer(block_size), schema=POSTINGS_SCHEMA
    )
    # sorted within files → parquet min/max row-group stats on `term`
    # make query-time term lookups prunable scans
    packed.sortWithinPartitions("term", "shard", "block_id").write.mode("overwrite").parquet(
        os.path.join(seg, "postings.parquet")
    )

    # --- per-segment term dictionary (df = Σ n_docs over blocks) ----------
    postings = spark.read.parquet(os.path.join(seg, "postings.parquet"))
    dict_df = postings.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"),
        F.max("max_tf").alias("max_tf"),
        F.sum("sum_tf").cast("long").alias("sum_tf"),
    )
    dict_df.write.mode("overwrite").parquet(os.path.join(seg, "dict.parquet"))

    # --- lineage manifest (north_star fields) ------------------------------
    stats_row = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.min("doc_id").alias("doc_id_min"),
        F.max("doc_id").alias("doc_id_max"),
    ).collect()[0]
    term_count = dict_df.count()
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
        "bytes": nbytes,
        "n_shards": n_shards,
        "block_size": block_size,
        "wall_time_sec": round(time.time() - t0, 3),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path)  # atomic, like canal/master.go:71-90
    return manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_segments: int = 1,
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Partition the doc space into ``n_segments`` and build each.

    Segment assignment is ``doc_id % n_segments`` (deterministic, so a
    killed build resumes with identical segment contents).
    """
    manifests = []
    for s in range(n_segments):
        part = docs.where(F.pmod(F.col("doc_id"), F.lit(n_segments)) == s) if n_segments > 1 else docs
        manifests.append(
            build_segment(
                spark, part, index_dir, segment_id=s, n_shards=n_shards, block_size=block_size
            )
        )
    return manifests
