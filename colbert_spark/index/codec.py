"""docID-delta + varbyte posting-list codec (numpy-vectorized).

The compressed-index analog of the reference's PQ compression (reference
``colbert/indexing/faiss_index.py:18-27``: IVFPQ m=64 nbits=8 over fp16
embeddings — lossy vector codes; ours is the classical lossless posting codec:
sorted docIDs → first-order deltas → LEB128 varbyte).

Both directions are fully vectorized numpy (no per-element Python loops) so
they run fast inside Arrow-batched pandas UDFs — the "no per-row Python"
input_hint applies inside UDF bodies too.
"""

from __future__ import annotations

import numpy as np


def vb_encode_concat(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128 varbyte-encode a non-negative int64 array (vectorized).

    Returns ``(buf, nbytes)``: the concatenated byte stream as a uint8 array
    and the per-value byte count — callers slice ``buf`` at
    ``cumsum(nbytes)`` boundaries to split one global encode into per-block
    payloads (LEB128 is self-delimiting, so any value-aligned slice decodes
    independently). This is what lets the index build encode a whole Arrow
    batch in ONE numpy pass instead of one call per posting block.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value (>=1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # 64 bits -> at most 10 groups; loop over group count, not elements
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp >>= np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    del nbits
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # end offset of each value's byte run
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # write group g of every value that has > g groups
    g = 0
    rem = v.copy()
    active = np.arange(v.size)
    while active.size:
        pos = starts[active] + g
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (rem[active] >> np.uint64(7)) > 0
        out[pos] = byte | (more.astype(np.uint8) << 7)
        rem[active] >>= np.uint64(7)
        active = active[more]
        g += 1
    return out, nbytes


def vb_encode(values: np.ndarray) -> bytes:
    """LEB128 varbyte-encode a non-negative int64 array → one byte string."""
    buf, _ = vb_encode_concat(values)
    return buf.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 varbytes back to an int64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0  # terminator byte of each value
    ends = np.flatnonzero(is_last)  # index of last byte per value
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & 0x7F).astype(np.uint64)
    # group index of each byte within its value
    byte_idx = np.arange(b.size, dtype=np.int64)
    value_id = np.cumsum(is_last) - is_last  # which value each byte belongs to
    group = byte_idx - starts[value_id]
    shifted = payload << (np.uint64(7) * group.astype(np.uint64))
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, value_id, shifted)
    return out.astype(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → first-order deltas (first kept raw)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a
    d = np.empty_like(a)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one block: sorted doc_ids → delta+varbyte; tfs → varbyte."""
    return vb_encode(delta_encode(doc_ids)), vb_encode(tfs)


def decode_postings(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(vb_decode(doc_bytes)), vb_decode(tf_bytes)
