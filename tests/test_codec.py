from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from splade_spark.index.codec import (
    decode_block,
    decode_varint,
    dequantize_weights,
    encode_blocks,
    encode_varint,
    quantize_weights,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


def test_varint_known_bytes():
    # classic LEB128: 300 = 0xAC 0x02
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.floats(min_value=0.0, max_value=20.0, allow_nan=False),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings):
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    weights = np.array([p[1] for p in postings])
    scale = 255.0 / 20.0
    blocks = encode_blocks(docs, weights, scale, block_size=128)
    got_docs, got_w = [], []
    for (bid, first, last, n, dbytes, wbytes, bmax) in blocks:
        d, w = decode_block(first, n, dbytes, wbytes, scale)
        assert d[0] == first and d[-1] == last and len(d) == n
        assert abs(w.max() - bmax) < 1e-12
        got_docs.append(d)
        got_w.append(w)
    got_docs = np.concatenate(got_docs)
    got_w = np.concatenate(got_w)
    order = np.argsort(docs, kind="stable")
    assert np.array_equal(got_docs, docs[order])
    expected_w = dequantize_weights(quantize_weights(weights[order], scale), scale)
    assert np.allclose(got_w, expected_w)
    # docID-ascending across blocks
    assert np.all(np.diff(got_docs) > 0)


@given(st.lists(st.integers(min_value=0, max_value=2**53 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_for_roundtrip(values):
    from splade_spark.index.codec import decode_for, encode_for

    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_for(encode_for(arr), len(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.floats(min_value=0.0, max_value=20.0, allow_nan=False),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_encode_groups_for_equals_varint(postings):
    """encode_groups with codec='for' decodes to the same postings as
    codec='varint' (only doc_bytes representation differs)."""
    from splade_spark.index.codec import encode_groups

    docs = np.sort(np.array([p[0] for p in postings], dtype=np.int64))
    weights = np.array([p[1] for p in postings])
    shard = np.zeros(len(docs), dtype=np.int64)
    term = np.zeros(len(docs), dtype=np.int64)
    scale = 255.0 / 20.0
    decoded = {}
    for codec in ("varint", "for"):
        g = encode_groups(shard, term, docs, weights, scale,
                          block_size=64, codec=codec)
        dd, ww = [], []
        for fd, n, db, wb in zip(g["first_doc"], g["n"],
                                 g["doc_bytes"], g["w_bytes"]):
            d, w = decode_block(fd, n, db, wb, scale, codec=codec)
            dd.append(d)
            ww.append(w)
        decoded[codec] = (np.concatenate(dd), np.concatenate(ww))
    assert np.array_equal(decoded["varint"][0], decoded["for"][0])
    assert np.array_equal(decoded["varint"][1], decoded["for"][1])
