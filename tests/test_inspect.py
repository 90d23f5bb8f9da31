"""index_stats / index_fsck: the stats must agree with ground truth computed
from the corpus, a freshly built (or appended/compacted) tree must fsck
clean at both depths, and a deliberately corrupted payload byte must be
CAUGHT by the deep check (and only the deep check — metadata stays valid)."""

import glob
import os
import shutil

import pytest

from colbert_spark.functions.tokenizer import py_tokenize
from colbert_spark.index.build import append_index, build_index
from colbert_spark.index.compact import compact_index
from colbert_spark.index.inspect import index_fsck, index_stats


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_inspect"))
    base = tiny_corpus.iloc[:500]
    build_index(spark, spark.createDataFrame(base), d, bucket_size=131, positions=True)
    return d, base


def test_stats_match_ground_truth(spark, built):
    d, base = built
    s = index_stats(spark, d)
    toks = [py_tokenize(t) for t in base["text"]]
    n_postings = sum(len(set(tk)) for tk in toks)
    vocab = set().union(*map(set, toks))
    assert s["N"] == len(base)
    assert s["postings"] == n_postings
    assert s["terms_in_dict"] == len(vocab)
    assert s["terms_with_postings"] == len(vocab)
    assert 0 < s["fill_ratio"] <= 1.0
    assert s["positions"] and "pos_bytes" in s["col_bytes"]
    assert s["payload_bytes"] == sum(s["col_bytes"].values())
    assert s["bytes_per_posting"] > 0


def test_fsck_clean_through_lifecycle(spark, built, tiny_corpus):
    d, _ = built
    assert index_fsck(spark, d)["ok"]
    deep = index_fsck(spark, d, deep=True)
    assert deep["ok"] and deep["blocks_decoded"] == deep["blocks_checked"] > 0

    append_index(spark, spark.createDataFrame(tiny_corpus.iloc[:700]), d)
    assert index_fsck(spark, d, deep=True)["ok"]
    compact_index(spark, d, preserve_epochs=False)
    assert index_fsck(spark, d, deep=True)["ok"]


def test_deep_fsck_catches_corrupt_payload(spark, built, tmp_path):
    d, _ = built
    # corrupt one parquet file's payload content by rewriting a doc_bytes
    # buffer with garbage of the same length (metadata checks still pass)
    import pyarrow.parquet as pq

    dc = str(tmp_path / "corrupt")
    shutil.copytree(d, dc)
    files = sorted(glob.glob(os.path.join(dc, "segments*/**/*.parquet"), recursive=True))
    assert files
    t = pq.read_table(files[0]).to_pandas()
    buf = bytearray(t.loc[0, "doc_bytes"])
    buf[-1] ^= 0x7F  # flip bits in the last varbyte — decode drifts
    t.loc[0, "doc_bytes"] = bytes(buf)
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), files[0])

    assert index_fsck(spark, dc)["ok"], "metadata-level check should still pass"
    deep = index_fsck(spark, dc, deep=True)
    assert not deep["ok"]
    assert any("decode" in e for e in deep["errors"])


def test_deep_fsck_catches_duplicated_postings(spark, built, tmp_path):
    """Duplicate a whole segment file under a fresh name — the exact artifact
    a crashed append retried under a different partition count would leave
    (duplicated (term, bucket, doc) contributions, which the dense kernel's
    fancy-index += silently drops and MaxScore double-counts). Deep fsck's
    count-vs-distinct invariant must flag it; the metadata level cannot see
    it (every copied block is internally self-consistent)."""
    dd = str(tmp_path / "dup")
    shutil.copytree(built[0], dd)
    files = sorted(glob.glob(os.path.join(dd, "segments*/**/p*.parquet"), recursive=True))
    assert files
    dup = os.path.join(os.path.dirname(files[0]), "p999999.e0.parquet")
    shutil.copyfile(files[0], dup)

    assert index_fsck(spark, dd)["ok"], "metadata level can't see duplicates"
    res = index_fsck(spark, dd, deep=True)
    assert not res["ok"]
    assert res["duplicate_postings"] > 0
    assert any("duplicated" in e for e in res["errors"])
