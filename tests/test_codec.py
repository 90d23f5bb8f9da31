"""Varbyte/delta codec: golden vectors + property tests (FIXTURES.md §4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from colbert_spark.index.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    vb_decode,
    vb_encode,
)


def test_vb_golden():
    # hand-computed LEB128: 1→0x01, 127→0x7f, 128→0x80 0x01, 300→0xac 0x02
    assert vb_encode(np.array([1])) == b"\x01"
    assert vb_encode(np.array([127])) == b"\x7f"
    assert vb_encode(np.array([128])) == b"\x80\x01"
    assert vb_encode(np.array([300])) == b"\xac\x02"
    assert vb_encode(np.array([1, 2, 128, 300])) == b"\x01\x02\x80\x01\xac\x02"
    assert vb_encode(np.array([], dtype=np.int64)) == b""
    assert vb_decode(b"") .size == 0


def test_vb_zero():
    assert vb_encode(np.array([0])) == b"\x00"
    assert vb_decode(b"\x00").tolist() == [0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=500)
)
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert vb_decode(vb_encode(arr)).tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300)
)
def test_postings_roundtrip(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = (doc_ids % 17) + 1
    db, tb = encode_postings(doc_ids, tfs)
    d2, t2 = decode_postings(db, tb)
    assert d2.tolist() == doc_ids.tolist()
    assert t2.tolist() == tfs.tolist()


def test_delta_monotonic():
    ids = np.array([5, 9, 10, 1000, 10**9])
    d = delta_encode(ids)
    assert d.tolist() == [5, 4, 1, 990, 10**9 - 1000]
    assert delta_decode(d).tolist() == ids.tolist()
