"""Stored fields (build_index(stored_cols=...)): extra input columns ride
the docs sink verbatim through build, append, delete+expunge, and merge —
the Lucene stored-fields / doc-values contract."""

import pandas as pd
import pytest

from colbert_spark.index.build import append_index, build_index
from colbert_spark.index.compact import compact_index
from colbert_spark.index.delete import delete_docs
from colbert_spark.index.merge import merge_indexes


def _pages(rows):
    return pd.DataFrame(rows, columns=["url", "text", "lang", "stars"])


@pytest.fixture(scope="module")
def stored_idx(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stored")
    idx = str(base / "idx")
    pages = _pages(
        [
            ("u0", "hash join table", "en", 5),
            ("u1", "slow scan filter", "de", 3),
            ("u2", "vector stream merge", "en", 4),
        ]
    )
    build_index(
        spark, spark.createDataFrame(pages), idx, bucket_size=2,
        stored_cols=["lang", "stars"],
    )
    return idx


def _sink(spark, idx):
    import json
    import os

    with open(os.path.join(idx, "stats.json")) as f:
        s = json.load(f)
    return spark.read.parquet(os.path.join(idx, s.get("docs_dir", "docs"))), s


def test_build_stores_columns(spark, stored_idx):
    sink, s = _sink(spark, stored_idx)
    assert s["stored_cols"] == ["lang", "stars"]
    rows = {r["url"]: (r["lang"], r["stars"]) for r in sink.collect()}
    assert rows == {"u0": ("en", 5), "u1": ("de", 3), "u2": ("en", 4)}


def test_append_carries_stored_columns(spark, stored_idx, tmp_path):
    import shutil

    idx = str(tmp_path / "appended")
    shutil.copytree(stored_idx, idx)
    new = _pages([("u3", "fresh batch of rows", "fr", 1)])
    append_index(spark, spark.createDataFrame(new), idx)
    sink, _ = _sink(spark, idx)
    rows = {r["url"]: (r["lang"], r["stars"]) for r in sink.collect()}
    assert rows["u3"] == ("fr", 1) and rows["u0"] == ("en", 5)


def test_expunge_preserves_stored_columns(spark, stored_idx, tmp_path):
    import shutil

    idx = str(tmp_path / "expunged")
    shutil.copytree(stored_idx, idx)
    delete_docs(spark, idx, spark.createDataFrame([(1,)], "doc_id long"))
    compact_index(spark, idx, expunge_deletes=True)
    sink, _ = _sink(spark, idx)
    rows = {r["url"]: (r["lang"], r["stars"]) for r in sink.collect()}
    assert "u1" not in rows and rows["u2"] == ("en", 4)


def test_merge_carries_stored_columns(spark, tmp_path):
    a, b_, m = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    build_index(
        spark,
        spark.createDataFrame(_pages([("a0", "hash join", "en", 2)])),
        a, bucket_size=1, stored_cols=["lang", "stars"],
    )
    build_index(
        spark,
        spark.createDataFrame(_pages([("b0", "scan filter", "de", 9)])),
        b_, bucket_size=1, stored_cols=["lang", "stars"],
    )
    merge_indexes(spark, [a, b_], m)
    sink, s = _sink(spark, m)
    assert s["stored_cols"] == ["lang", "stars"]
    rows = {r["url"]: (r["lang"], r["stars"]) for r in sink.collect()}
    assert rows == {"a0": ("en", 2), "b0": ("de", 9)}

    # mismatched stored_cols refuse to merge
    c = str(tmp_path / "c")
    build_index(
        spark,
        spark.createDataFrame(_pages([("c0", "vector merge", "en", 1)])),
        c, bucket_size=1,
    )
    with pytest.raises(ValueError, match="stored_cols"):
        merge_indexes(spark, [a, c], str(tmp_path / "m2"))
