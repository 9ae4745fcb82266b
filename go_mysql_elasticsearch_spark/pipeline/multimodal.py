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
    """REAL image decode for the netpbm family — binary PPM (P6, RGB)
    and PGM (P5, grayscale) need no codec library: whitespace-delimited
    ASCII header (magic, width, height, maxval; '#' comments allowed),
    then a raw big-endian pixel payload. Returns uint8 ndarray of shape
    (h, w, 3) for P6 or (h, w) for P5.

    Compressed formats (PNG/JPEG) would plug in here via PIL — the
    container ships no codecs, so those branches raise. The Spark-side
    plumbing (schemas, Arrow batching, bytes-bounded partitions) is
    identical either way, and the PPM path end-to-end gates the decode
    kernel for real (entries image_features / image_stats)."""
    if not b:
        raise ValueError("empty image payload")
    if b[:2] in (b"\x89P", b"\xff\xd8"):
        raise NotImplementedError("PNG/JPEG need a codec library (PIL) — not in this container")
    if b[:2] not in (b"P6", b"P5"):
        raise ValueError(f"unsupported image magic {b[:2]!r}")
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, '#'-to-EOL comments legal anywhere between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raw payload
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if b[:2] == b"P6" else 1
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=pos)
    return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))


def encode_ppm(px: "np.ndarray") -> bytes:
    """Inverse of :func:`decode_image` for (h, w, 3) uint8 arrays —
    used by fixtures and the round-trip property test."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


IMG_FEAT_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, std_gray double"
)


def image_features(df: DataFrame, bin_col: str = "img", id_col: str = "doc_id") -> DataFrame:
    """REAL feature extraction over decoded images: per-channel means +
    grayscale population std — the exact mapInPandas shape a CLIP-style
    embedder uses (binary in → typed features out), with the decode
    kernel actually running. Rounded to 6 places for cross-engine
    comparison."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                px = decode_image(b).astype(np.float64)
                if px.ndim == 2:
                    px = np.stack([px] * 3, axis=-1)
                gray = px.mean(axis=2)
                rows.append(
                    (int(did), px.shape[1], px.shape[0],
                     round(float(px[:, :, 0].mean()), 6),
                     round(float(px[:, :, 1].mean()), 6),
                     round(float(px[:, :, 2].mean()), 6),
                     round(float(gray.std()), 6))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_r", "mean_g",
                               "mean_b", "std_gray"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=IMG_FEAT_SCHEMA)


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
