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
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\xff\xd8\xff\xe0....")
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
