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


# --- batch (concatenated-stream) decode equivalence ------------------------

@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_vb_decode_concat_matches_per_stream(streams):
    from go_mysql_elasticsearch_spark.index.codec import _concat_bufs, vb_decode_concat

    bufs = [vb_encode(np.array(s, dtype=np.uint64)) for s in streams]
    vals, counts = vb_decode_concat(*_concat_bufs(bufs))
    assert counts.tolist() == [len(s) for s in streams]
    flat = [v for s in streams for v in s]
    assert vals.tolist() == flat


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=30),  # doc gap
                st.integers(min_value=1, max_value=9),  # tf
                st.integers(min_value=1, max_value=500),  # dl
            ),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=60, deadline=None)
def test_unpack_blocks_batch_matches_per_block(blocks):
    from go_mysql_elasticsearch_spark.index.codec import (
        unpack_blocks_batch,
        unpack_positions,
        unpack_positions_batch,
    )
    from go_mysql_elasticsearch_spark.index.codec import (
        delta_encode_segmented,
        vb_encode,
    )

    rng = np.random.default_rng(7)
    doc_bufs, tf_bufs, dl_bufs, pos_bufs = [], [], [], []
    exp_docs, exp_tfs, exp_dls, exp_pos = [], [], [], []
    base = 0
    for blk in blocks:
        gaps = np.array([g for g, _, _ in blk], dtype=np.int64)
        docs = base + np.cumsum(gaps)
        base = int(docs[-1])  # keep blocks doc-sorted across the sub-list
        tfs = np.array([t for _, t, _ in blk], dtype=np.int64)
        dls = np.array([d for _, _, d in blk], dtype=np.int64)
        d_b, t_b, l_b = pack_block(docs, tfs, dls)
        # positions: tf sorted positions per posting
        flat = np.concatenate(
            [np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs]
        ).astype(np.uint64)
        p_b = vb_encode(delta_encode_segmented(flat, tfs))
        doc_bufs.append(d_b); tf_bufs.append(t_b); dl_bufs.append(l_b); pos_bufs.append(p_b)
        exp_docs.append(docs); exp_tfs.append(tfs); exp_dls.append(dls); exp_pos.append(flat)
        # per-block reference for positions
        ref_flat, ref_off = unpack_positions(p_b, tfs)
        assert ref_flat.tolist() == flat.tolist()

    got_d, got_t, got_l, nper = unpack_blocks_batch(doc_bufs, tf_bufs, dl_bufs)
    assert got_d.tolist() == np.concatenate(exp_docs).tolist()
    assert got_t.tolist() == np.concatenate(exp_tfs).tolist()
    assert got_l.tolist() == np.concatenate(exp_dls).tolist()
    assert nper.tolist() == [len(b) for b in blocks]

    all_tfs = np.concatenate(exp_tfs)
    flat, off = unpack_positions_batch(pos_bufs, all_tfs)
    assert flat.tolist() == np.concatenate(exp_pos).tolist()
    assert off.tolist() == (np.cumsum(all_tfs) - all_tfs).tolist()
