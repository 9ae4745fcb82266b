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

    PNG is decoded for REAL below (:func:`decode_png` — deflate is
    stdlib zlib; filters are numpy); JPEG still raises honestly (the
    container ships no entropy-decode/IDCT codec). The Spark-side
    plumbing (schemas, Arrow batching, bytes-bounded partitions) is
    identical either way, and both the PPM and PNG paths are
    value-hash gated end-to-end (entries image_features /
    png_image_features)."""
    if not b:
        raise ValueError("empty image payload")
    if b[:2] == b"\x89P":
        return decode_png(b)  # real PNG decode below — stdlib zlib only
    if b[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG needs a codec library (PIL) — not in this container")
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


# --- PNG: real decode/encode, stdlib zlib + numpy, no codec library ---------
#
# PNG (RFC 2083) is deflate-compressed filtered scanlines in a chunked
# container — all of which the standard library covers: zlib for the
# IDAT stream and CRCs, numpy for the pixel math. Supported: 8-bit,
# color types 0 (grayscale) and 2 (RGB), non-interlaced — the shape a
# web-scale image pipeline normalizes to anyway. JPEG stays an honest
# NotImplementedError (entropy decode + IDCT is a codec library's job).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> "np.ndarray":
    """Parse chunks, inflate IDAT, undo per-row filters (all five:
    None/Sub/Up/Average/Paeth). Returns uint8 (h, w, 3) for RGB or
    (h, w) for grayscale."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        size = int.from_bytes(b[pos:pos + 4], "big")
        ctype = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace} unsupported "
            "(8-bit gray/RGB non-interlaced only)"
        )
    ch = 3 if color == 2 else 1
    raw = zlib.decompress(b"".join(idat))
    rowbytes = w * ch
    if len(raw) != h * (rowbytes + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int32)
    for r in range(h):
        line = raw[r * (rowbytes + 1): (r + 1) * (rowbytes + 1)]
        f, cur = line[0], np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need the in-row left neighbor
            rec = np.zeros(rowbytes, dtype=np.int32)
            for i in range(rowbytes):
                a = int(rec[i - ch]) if i >= ch else 0
                up = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if f == 1:
                    rec[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (cur[i] + ((a + up) >> 1)) & 0xFF
                elif f == 4:
                    rec[i] = (cur[i] + _paeth(a, up, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    px = out.reshape((h, w, ch))
    return px if ch == 3 else px.reshape((h, w))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big") + ctype + body
        + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(px: "np.ndarray", filters: list[int] | None = None) -> bytes:
    """Inverse of :func:`decode_png` for uint8 (h, w, 3) or (h, w)
    arrays. ``filters`` optionally pins the per-row filter type (0-4) —
    the fixtures cycle through all five so the decoder's unfiltering is
    value-hash gated, not just the happy filter-0 path."""
    import zlib

    a3 = px if px.ndim == 3 else px.reshape(px.shape[0], px.shape[1], 1)
    h, w, ch = a3.shape
    if ch not in (1, 3):
        raise ValueError("encode_png supports 1 or 3 channels")
    color = 2 if ch == 3 else 0
    flat = a3.astype(np.int32).reshape(h, w * ch)
    rowbytes = w * ch
    lines = bytearray()
    prev = np.zeros(rowbytes, dtype=np.int32)
    for r in range(h):
        cur = flat[r]
        f = filters[r % len(filters)] if filters else 0
        if f == 0:
            enc = cur & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.zeros(rowbytes, dtype=np.int32)
            for i in range(rowbytes):
                a = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if f == 1:
                    enc[i] = (cur[i] - a) & 0xFF
                elif f == 3:
                    enc[i] = (cur[i] - ((a + up) >> 1)) & 0xFF
                elif f == 4:
                    enc[i] = (cur[i] - _paeth(a, up, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        lines.append(f)
        lines.extend(int(x) for x in enc)
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


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


# --- audio: WAV/PCM (RIFF) — real decode, no codec library ------------------

def decode_wav(b: bytes) -> tuple[int, "np.ndarray"]:
    """REAL audio decode for canonical PCM WAV: RIFF/WAVE container,
    'fmt ' chunk (PCM s16le only) + 'data' chunk. Returns
    (sample_rate, int16 samples ndarray [n, channels]). Compressed
    audio (MP3/AAC) would need a codec — raises honestly."""
    if not b or len(b) < 12:
        raise ValueError("empty/short audio payload")
    if b[:3] == b"ID3" or b[:2] == b"\xff\xfb":
        raise NotImplementedError("MP3 needs a codec library — not in this container")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"unsupported audio magic {b[:4]!r}")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise NotImplementedError("only PCM (fmt=1) WAV is supported")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only s16le PCM supported")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, samples.reshape(-1, n_ch)


def encode_wav(rate: int, samples: "np.ndarray") -> bytes:
    """Inverse of :func:`decode_wav` for int16 [n, ch] arrays."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    n_ch = s.shape[1] if s.ndim == 2 else 1
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * n_ch * 2).to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


AUDIO_FEAT_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, rms double, zero_crossings long"
)


def audio_features(df: DataFrame, bin_col: str = "audio", id_col: str = "doc_id") -> DataFrame:
    """REAL audio features over decoded PCM: RMS + zero-crossing count
    (channel 0) — the mapInPandas shape a wav2vec-style embedder uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                rate, s = decode_wav(b)
                c0 = s[:, 0].astype(np.float64)
                rms = float(np.sqrt(np.mean(c0 * c0)))
                zc = int(np.sum(np.signbit(c0[1:]) != np.signbit(c0[:-1])))
                rows.append((int(did), rate, len(c0), round(rms, 6), zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "rms", "zero_crossings"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=AUDIO_FEAT_SCHEMA)


# --- video: concatenated-PPM frame stream — real frame extraction -----------

def iter_video_frames(b: bytes):
    """A 'video' as a raw concatenated-P6 stream (MJPEG-minus-JPEG):
    yields decoded (h, w, 3) frames by walking frame boundaries from
    each header's declared payload size."""
    pos = 0
    while pos < len(b):
        if b[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame magic at {pos}")
        frame_start = pos
        # reuse the image header parser by decoding from this offset
        px = decode_image(b[pos:])
        h, w = px.shape[0], px.shape[1]
        hdr_len = len(b"P6\n%d %d\n255\n" % (w, h))
        pos = frame_start + hdr_len + w * h * 3
        yield px


VIDEO_FEAT_SCHEMA = "doc_id long, frame_no int, mean_gray double"


def video_frame_features(
    df: DataFrame, bin_col: str = "video", id_col: str = "doc_id", every_n: int = 2
) -> DataFrame:
    """REAL frame sampling + per-frame features: every ``every_n``-th
    frame of the concatenated-PPM stream is decoded and reduced to its
    grayscale mean. The explode happens AFTER the per-doc repartition
    implied by mapInPandas batching, so one long video cannot skew a
    task beyond its own row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_mg = [], [], []
            for did, b in zip(pdf[id_col], pdf[bin_col]):
                for i, px in enumerate(iter_video_frames(b)):
                    if i % every_n:
                        continue
                    out_id.append(int(did))
                    out_no.append(i)
                    out_mg.append(round(float(px.astype(np.float64).mean()), 6))
            yield pd.DataFrame({"doc_id": out_id, "frame_no": out_no, "mean_gray": out_mg})

    return df.select(id_col, bin_col).mapInPandas(run, schema=VIDEO_FEAT_SCHEMA)


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
