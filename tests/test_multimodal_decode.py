"""Real netpbm decode kernel (pipeline/multimodal.py): round-trip
property, header edge cases, and honest failures for codec-requiring
formats."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_mysql_elasticsearch_spark.pipeline.multimodal import (
    decode_image,
    decode_png,
    encode_png,
    encode_ppm,
)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(px)), px)


def test_ppm_header_comments_and_whitespace():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6 # a comment\n# another comment\n 2\t2 # dims\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(raw), px)


def test_pgm_grayscale():
    raw = b"P5\n3 2\n255\n" + bytes(range(6))
    got = decode_image(raw)
    assert got.shape == (2, 3)
    assert got.tolist() == [[0, 1, 2], [3, 4, 5]]


def test_codec_formats_raise_honestly():
    # truncated PNG: routed to the real decoder, which fails loud
    with pytest.raises(ValueError, match="IHDR"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    # truncated JPEG: routed to the real baseline decoder, fails loud
    with pytest.raises(ValueError, match="SOS"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x02\xff\xd9")
    with pytest.raises(ValueError):
        decode_image(b"")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")


@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5),
)
@settings(max_examples=100, deadline=None)
def test_png_roundtrip_all_filters(w, h, seed, filters):
    """encode→decode is the identity for every per-row filter mix —
    the unfiltering reconstructors (Sub/Up/Average/Paeth) are each
    exercised by the cycling filter list."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filters=filters)), px)
    # grayscale path too
    g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g, filters=filters)), g)


def test_png_routed_through_decode_image_and_limits():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(decode_image(encode_png(px, filters=[4])), px)
    # unsupported shapes fail loud, not wrong
    bad_ihdr = encode_png(px)[:8] + b"\x00\x00\x00\x0dIHDR" + (
        (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    ) + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_png(bad_ihdr + b"\x00\x00\x00\x00IDATxxxx\x00\x00\x00\x00IEND" + b"\x00" * 4)


@given(
    st.integers(min_value=1, max_value=3),       # channels
    st.integers(min_value=1, max_value=500),     # samples
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip(n_ch, n, seed):
    from go_mysql_elasticsearch_spark.pipeline.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, n_ch), dtype=np.int16)
    rate, got = decode_wav(encode_wav(44100, s))
    assert rate == 44100
    assert np.array_equal(got, s)


def test_wav_rejects_compressed_and_garbage():
    from go_mysql_elasticsearch_spark.pipeline.multimodal import decode_wav

    with pytest.raises(NotImplementedError, match="codec"):
        decode_wav(b"ID3\x04\x00" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 20)


def test_video_frame_iteration_boundaries():
    from go_mysql_elasticsearch_spark.pipeline.multimodal import (
        encode_ppm,
        iter_video_frames,
    )

    frames = [
        np.full((2, 3, 3), v, dtype=np.uint8) for v in (0, 100, 255)
    ]
    stream = b"".join(encode_ppm(f) for f in frames)
    got = list(iter_video_frames(stream))
    assert len(got) == 3
    for f, g in zip(frames, got):
        assert np.array_equal(f, g)


# --- baseline JPEG (real codec: huffman -> dequant -> IDCT) -----------------

from go_mysql_elasticsearch_spark.pipeline.multimodal import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_gray_roundtrip_near_lossless(w, h, seed):
    """All-ones quant table: every coefficient rounds by <= 0.5, so the
    per-pixel reconstruction error is tightly bounded (measured <= 2;
    bound the assert at 3 for float slack). Exercises edge-replicated
    padding for non-multiple-of-8 sizes."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 3


@given(
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_rgb_roundtrip(w, h, seed):
    """4:4:4 color: YCbCr forward/backward adds its own rounding; the
    error stays a few counts per channel."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = decode_image(encode_jpeg(px))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 4


def test_jpeg_flat_blocks_exact():
    """A flat 8x8 block's DCT is DC-only (8*(v-128)); with a quant DC
    step of 8 the quantized value is exactly v-128, so the decode is
    EXACT — the property the oracle-gated fixture relies on."""
    q = np.full((8, 8), 8, dtype=np.int64)
    vals = (0, 7, 128, 255)
    px = np.zeros((16, 16), dtype=np.uint8)
    for k, v in enumerate(vals):
        by, bx = divmod(k, 2)
        px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    assert np.array_equal(decode_jpeg(encode_jpeg(px, qtab=q)), px)


def test_jpeg_byte_stuffing_roundtrip():
    """Seed chosen so the entropy stream contains a stuffed 0xFF00 —
    the unstuffing path is exercised, not just possible."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    blob = encode_jpeg(px)
    scan = blob[blob.find(b"\xff\xda") :]
    assert b"\xff\x00" in scan
    assert np.abs(decode_jpeg(blob).astype(int) - px.astype(int)).max() <= 3


def test_jpeg_unsupported_shapes_raise_with_reason():
    px = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    # progressive: flip SOF0 -> SOF2
    i = bytes(blob).find(b"\xff\xc0")
    prog = bytes(blob[:i]) + b"\xff\xc2" + bytes(blob[i + 2 :])
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
    # chroma subsampling: set the component's H/V byte to 2x2
    j = i + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc+cid -> hv byte
    sub = bytes(blob[:j]) + b"\x22" + bytes(blob[j + 1 :])
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(sub)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


# --- FLAC (real lossless codec: rice residuals, LPC, decorrelation) ---------

from go_mysql_elasticsearch_spark.pipeline.multimodal import (  # noqa: E402
    decode_audio,
    decode_flac,
    encode_flac,
)


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=2),
    st.sampled_from(["fixed2", "lpc1", "verbatim", "escape"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_flac_roundtrip_lossless(n, n_ch, mode, seed):
    """FLAC is lossless: decode(encode(x)) == x EXACTLY for every
    subframe coder (fixed-order-2 rice, LPC, verbatim, rice-escape;
    constant auto-detected)."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(n, n_ch), dtype=np.int16)
    rate, got = decode_flac(encode_flac(44100, s.astype(np.int64), mode=mode))
    assert rate == 44100
    assert np.array_equal(got, s)


@given(
    st.sampled_from(["left_side", "right_side", "mid_side"]),
    st.sampled_from(["fixed2", "verbatim", "escape"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_flac_stereo_decorrelation_exact(stereo, mode, seed):
    """All three decorrelation modes reconstruct exactly — including
    the mid/side lost-LSB recovery and the side channel's bps+1."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=(129, 2), dtype=np.int16)
    _, got = decode_flac(encode_flac(8000, s.astype(np.int64), mode=mode, stereo=stereo))
    assert np.array_equal(got, s)


def test_flac_constant_and_dispatch():
    c = np.full((64, 1), -123, dtype=np.int16)
    rate, got = decode_audio(encode_flac(8000, c.astype(np.int64)))
    assert rate == 8000 and np.array_equal(got, c)


def test_flac_crc_guards():
    s = np.arange(-50, 50, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_flac(8000, s.astype(np.int64)))
    blob[-1] ^= 0xFF  # corrupt frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"not flac at all")


def test_gif_lzw_roundtrip_all_paths():
    """Encoder/decoder LZW sync across every tricky path: width bumps,
    the 4096-entry clear, KwKwK self-reference, odd dims, small
    palettes. Any off-by-one in the code-size bump rule fails here."""
    import numpy as np

    from go_mysql_elasticsearch_spark.pipeline.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(7)
    pal = np.stack(
        [np.arange(256), (np.arange(256) + 1) % 256, (np.arange(256) + 2) % 256], axis=1
    ).astype(np.uint8)
    for shape in [(8, 8), (37, 23), (128, 128)]:  # big one forces a clear
        idx = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert (decode_gif(encode_gif(idx, pal)) == pal[idx.astype(np.int64)]).all()
    # repetitive content: long dictionary chains
    idx = np.tile(np.arange(16, dtype=np.uint8), 1024).reshape(128, 128)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx.astype(np.int64)]).all()
    # KwKwK: constant run
    idx = np.zeros((4, 4), dtype=np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx.astype(np.int64)]).all()
    # 4-color palette (min code size 2)
    idx = rng.randint(0, 4, size=(19, 31)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal[:4])) == pal[:4][idx.astype(np.int64)]).all()


def test_gif_decode_rejects_garbage():
    import pytest as _pytest

    from go_mysql_elasticsearch_spark.pipeline.multimodal import decode_gif, decode_image

    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF....")
    with _pytest.raises(ValueError):
        decode_image(b"GIF87a" + b"\x00" * 7)  # no image descriptor
