"""Varbyte + delta-gap round-trip — property-based per SURVEY.md §5 item 1."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from horus_ner_spark.index.codec import decode_block, encode_block, vb_decode, vb_encode


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@given(
    st.sets(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=400),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_block_roundtrip(doc_id_set, data):
    doc_ids = np.array(sorted(doc_id_set), dtype=np.int64)
    tfs = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=10_000),
                min_size=len(doc_ids),
                max_size=len(doc_ids),
            )
        ),
        dtype=np.int64,
    )
    dvb, tvb = encode_block(doc_ids, tfs)
    d2, t2 = decode_block(dvb, tvb)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)


def test_empty_block():
    dvb, tvb = encode_block(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    d, t = decode_block(dvb, tvb)
    assert len(d) == 0 and len(t) == 0


def test_int64_extremes():
    doc_ids = np.array([-(2**63), -1, 0, 2**63 - 1], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4], dtype=np.int64)
    d, t = decode_block(*encode_block(doc_ids, tfs))
    assert np.array_equal(d, doc_ids) and np.array_equal(t, tfs)


def test_compression_actually_compresses():
    # dense ascending ids -> tiny gaps -> ~1 byte/posting for ids
    doc_ids = np.arange(10_000, dtype=np.int64)
    tfs = np.ones(10_000, dtype=np.int64)
    dvb, tvb = encode_block(doc_ids, tfs)
    assert len(dvb) < 10_000 * 2  # vs 80_000 raw bytes
    assert len(tvb) == 10_000


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=50),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_stream_roundtrip(pos_sets):
    """Concat of per-posting encoded position streams decodes and re-splits
    exactly (the block pos_vb layout)."""
    from horus_ner_spark.index.codec import (
        decode_positions,
        encode_positions,
        pos_slice_offsets,
    )

    runs = [np.array(sorted(s), dtype=np.int64) for s in pos_sets]
    encoded = [encode_positions(r) for r in runs]
    stream = b"".join(encoded)
    tfs = np.array([len(r) for r in runs], dtype=np.int64)
    vals, starts = decode_positions(stream, tfs)
    assert len(vals) == int(tfs.sum())
    for i, r in enumerate(runs):
        assert np.array_equal(vals[starts[i] : starts[i + 1]], r)
    off = pos_slice_offsets(stream, tfs)
    assert off[0] == 0 and off[-1] == len(stream)
    for i, e in enumerate(encoded):
        assert stream[off[i] : off[i + 1]] == e
