"""Pure-numpy unit tests for the block-encode kernel (no SparkSession):
_encode_arrays/_encode_partition must produce decodable, doc-ordered,
upper-bounded blocks for any input permutation and batch slicing."""

import numpy as np
import pandas as pd

from colbert_spark.index.build import BLOCK_SIZE, _encode_partition
from colbert_spark.index.codec import decode_block
from colbert_spark.oracle import bm25_term_score

K1, B, N_DOCS, AVGDL = 0.9, 0.4, 1000, 50.0


def _mk_frame(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "term_id", "bucket", "doclen", "df"]
    ).astype(np.int64)


def _run(rows, batch_size=7):
    fn = _encode_partition(K1, B, AVGDL)
    pdf = _mk_frame(rows)
    batches = (pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size))
    out = list(fn(batches))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _decode_all(seg):
    """→ {(term_id, bucket): [(doc, tf, dl), ...] in doc order}."""
    groups = {}
    for r in seg.sort_values(["term_id", "bucket", "first_doc"]).itertuples():
        docs = np.cumsum(decode_block(r.doc_bytes))
        tfs = decode_block(r.tf_bytes)
        dls = decode_block(r.dl_bytes)
        groups.setdefault((r.term_id, r.bucket), []).extend(
            zip(docs.tolist(), tfs.tolist(), dls.tolist())
        )
    return groups


def test_empty_input_yields_nothing():
    assert len(_run([])) == 0


def test_single_posting():
    seg = _run([(5, 7, 0, 30, 2)])
    assert len(seg) == 1
    row = seg.iloc[0]
    assert row["first_doc"] == row["last_doc"] == 5
    assert row["n"] == 1
    assert np.cumsum(decode_block(row["doc_bytes"])).tolist() == [5]
    assert decode_block(row["tf_bytes"]).tolist() == [1]


def test_tf_run_length_recovery():
    # doc 3 mentions term 1 four times — raw rows collapse to tf=4
    rows = [(3, 1, 0, 30, 1)] * 4 + [(9, 1, 0, 20, 1)]
    seg = _run(rows, batch_size=2)  # runs split across batches
    groups = _decode_all(seg)
    assert groups[(1, 0)] == [(3, 4, 30), (9, 1, 20)]


def test_unsorted_input_is_sorted_by_kernel():
    rng = np.random.default_rng(7)
    rows = []
    for _ in range(3000):
        doc = int(rng.integers(0, 400))
        rows.append((doc, int(rng.integers(0, 40)), doc // 100, 25, 10))
    seg = _run(rows, batch_size=501)
    groups = _decode_all(seg)
    # doc-ordered and unique within each (term, bucket)
    for docs_tfs in groups.values():
        docs = [d for d, _, _ in docs_tfs]
        assert docs == sorted(docs)
        assert len(docs) == len(set(docs))
    # postings count matches distinct (term, doc)
    want = len({(t, d) for d, t, *_ in rows})
    assert sum(len(v) for v in groups.values()) == want


def test_block_size_and_ids():
    rows = [(d, 1, 0, 30, 300) for d in range(300)]
    seg = _run(rows).sort_values("block_id")
    assert seg["n"].tolist() == [BLOCK_SIZE, BLOCK_SIZE, 300 - 2 * BLOCK_SIZE]
    assert seg["block_id"].tolist() == [0, 1, 2]
    assert seg["first_doc"].tolist() == [0, BLOCK_SIZE, 2 * BLOCK_SIZE]


def test_max_unit_is_true_upper_bound():
    """Stored block metadata is idf-free (format v2): max_unit bounds the
    UNIT contribution (idf=1) of every posting in the block. Multiplying by
    any non-negative idf preserves the bound, so the query-time block-max
    skip stays safe for whatever idf the current term_dict yields."""
    rng = np.random.default_rng(3)
    rows = []
    for _ in range(2000):
        rows.extend(
            [(int(rng.integers(0, 300)), int(rng.integers(0, 20)), 0,
              int(rng.integers(10, 90)), 50)]
            * int(rng.integers(1, 4))
        )
    seg = _run(rows, batch_size=333)
    for r in seg.itertuples():
        tfs = decode_block(r.tf_bytes)
        dls = decode_block(r.dl_bytes)
        for tf, dl in zip(tfs, dls):
            assert bm25_term_score(int(tf), int(dl), AVGDL, 1.0) <= r.max_unit + 1e-12
