"""M2: varbyte/delta posting codec round-trip properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_mysql_elasticsearch_spark.index.codec import (
    delta_decode,
    delta_encode,
    pack_block,
    unpack_block,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(a)).tolist() == vals


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").tolist() == []


def test_vb_boundaries():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**62]
    a = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(a)).tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    a = np.array(sorted(vals), dtype=np.uint64)
    assert delta_decode(delta_encode(a)).tolist() == sorted(vals)


def test_pack_unpack_block():
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.choice(10**9, size=128, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, 128)
    dls = rng.integers(5, 400, 128)
    d, t, l = unpack_block(*pack_block(doc_ids, tfs, dls))
    np.testing.assert_array_equal(d.astype(np.int64), doc_ids)
    np.testing.assert_array_equal(t.astype(np.int64), tfs)
    np.testing.assert_array_equal(l.astype(np.int64), dls)


def test_compression_is_compact():
    # dense doc ids → ~1 byte/gap
    doc_ids = np.arange(0, 128 * 4, 4, dtype=np.int64)
    tfs = np.ones(128, dtype=np.int64)
    dls = np.full(128, 100, dtype=np.int64)
    docs_vb, tfs_vb, dls_vb = pack_block(doc_ids, tfs, dls)
    assert len(docs_vb) <= 130
    assert len(tfs_vb) == 128
    assert len(dls_vb) == 128
