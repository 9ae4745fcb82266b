"""Property-based codec round-trips (hypothesis): the packed index
format survives arbitrary inputs, not just fixture shapes."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_mysql_elasticsearch_spark.index.codec import (
    delta_decode,
    delta_decode_segmented,
    delta_encode,
    delta_encode_segmented,
    pack_block,
    unpack_block,
    unpack_positions,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (vb_decode(vb_encode(arr)) == arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert (delta_decode(delta_encode(arr)) == arr).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=20),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_segmented_positions_roundtrip(runs):
    runs = [sorted(r) for r in runs]
    flat = np.array([v for r in runs for v in r], dtype=np.uint64)
    lens = np.array([len(r) for r in runs], dtype=np.int64)
    enc = vb_encode(delta_encode_segmented(flat, lens))
    dec, off = unpack_positions(enc, lens)
    assert (dec == flat).all()
    assert (off == np.cumsum(lens) - lens).all()
    assert (delta_decode_segmented(delta_encode_segmented(flat, lens), lens) == flat).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=128, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_pack_block_roundtrip(doc_ids, data):
    n = len(doc_ids)
    docs = np.array(sorted(doc_ids), dtype=np.uint64)
    tfs = np.array(data.draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n)), dtype=np.uint64)
    dls = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)), dtype=np.uint64)
    d_b, t_b, l_b = pack_block(docs, tfs, dls)
    d2, t2, l2 = unpack_block(d_b, t_b, l_b)
    assert (d2 == docs).all() and (t2 == tfs).all() and (l2 == dls).all()
