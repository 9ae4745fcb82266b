"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* kernels are
stubbed (deterministic fake features / NotImplementedError), but the
Spark-side plumbing is real and tested: binary columns flow through
Arrow-batched ``mapInPandas`` with explicit schemas, partition sizing
is by bytes not rows, and metadata extraction (magic sniffing, sizes)
is genuine. Swapping the stub for PIL/ffmpeg changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

META_SCHEMA = "doc_id long, n_bytes long, magic string, kind string"
FEAT_SCHEMA = f"doc_id long, feature array<float>"


def sniff_magic(b: bytes | None) -> tuple[str, str]:
    if not b:
        return "", "empty"
    head = b[:8]
    if head.startswith(b"\x89PNG"):
        return head[:4].hex(), "image/png"
    if head.startswith(b"\xff\xd8\xff"):
        return head[:3].hex(), "image/jpeg"
    if head.startswith(b"<html") or head.startswith(b"<!DOC"):
        return head[:5].decode("ascii", "replace"), "text/html"
    return head[:4].hex(), "application/octet-stream"


def binary_metadata(df: DataFrame, bin_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Typed metadata over an opaque binary column (mapInPandas,
    Arrow-batched; the per-task input is bounded by
    spark.sql.files.maxPartitionBytes, which is the knob that matters
    when the binary column is MBs per row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_magic(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[bin_col]],
                    "magic": [m[0] for m in metas],
                    "kind": [m[1] for m in metas],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=META_SCHEMA)


def decode_image(b: bytes) -> "np.ndarray":
    """Real decode would go here (PIL.Image.open → np array). The
    container ships no codecs — STUB, clearly marked."""
    raise NotImplementedError("image codecs not available in this container")


def fake_features(df: DataFrame, bin_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in feature extractor: md5 of the payload →
    FEATURE_DIM floats in [-1, 1]. Exercises the exact batch shape a
    real embedding UDF uses (binary in → array<float> out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bin_col]:
                d = hashlib.md5(b or b"").digest()
                arr = np.frombuffer((d * ((FEATURE_DIM * 4) // 16 + 1))[: FEATURE_DIM * 4], dtype="<u4")
                feats.append((arr.astype(np.float64) / 0xFFFFFFFF * 2 - 1).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(run, schema=FEAT_SCHEMA)


def frame_sample_plan(df: DataFrame, bin_col: str = "video", every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: rows (doc_id, frame_no) exploded
    from metadata — the decode itself is the stubbed kernel. Shows the
    partitioning story: explode AFTER repartitioning by doc so one
    giant video cannot skew a task."""
    return (
        df.select("doc_id", F.length(bin_col).alias("n_bytes"))
        .withColumn("n_frames", (F.col("n_bytes") / 1000).cast("int"))
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))).alias("frame_no"))
    )
