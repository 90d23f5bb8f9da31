"""Manifest-driven resume: an interrupted build resumes without recomputing
done partitions (north_rule lineage clause; the analog of the reference's
per-rank tmp checkpoint merge, ``colbert/indexing/encoder.py:122-135``).

Interruption is simulated by deleting a subset of bucket segment dirs and
their manifest rows from a completed build — exactly the on-disk state an
executor crash mid-write leaves behind (done buckets durable + manifested,
in-flight buckets absent).
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from colbert_spark.index.build import build_index
from colbert_spark.query.wand import bm25_topk_segments


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus).cache()


def _seg_mtimes(index_dir):
    files = glob.glob(
        os.path.join(index_dir, "segments", "bucket=*", "tshard=*", "*.parquet")
    )
    assert files, "no segment files found — layout glob is stale"
    return {f: os.path.getmtime(f) for f in files}


def test_resume_recomputes_only_missing_buckets(spark, corpus_df, tiny_queries, tmp_path):
    ref_dir = str(tmp_path / "ref")
    idx_dir = str(tmp_path / "resumable")
    build_index(spark, corpus_df, ref_dir, bucket_size=127)
    build_index(spark, corpus_df, idx_dir, bucket_size=127)

    manifest = spark.read.parquet(os.path.join(idx_dir, "manifest"))
    all_buckets = sorted(r["bucket"] for r in manifest.select("bucket").collect())
    assert len(all_buckets) >= 4, "need multiple buckets to simulate interruption"
    killed = all_buckets[1::3]  # destroy every third bucket

    # simulate the crash: killed buckets' segments gone, manifest rows gone
    for bkt in killed:
        shutil.rmtree(os.path.join(idx_dir, "segments", f"bucket={bkt}"))
    kept_manifest = manifest.filter(~F.col("bucket").isin(killed))
    kept_rows = kept_manifest.collect()
    shutil.rmtree(os.path.join(idx_dir, "manifest"))
    spark.createDataFrame(kept_rows, manifest.schema).write.parquet(
        os.path.join(idx_dir, "manifest")
    )

    survivors = _seg_mtimes(idx_dir)
    build_index(spark, corpus_df, idx_dir, bucket_size=127, resume=True)

    # survivors untouched (no recomputation of done partitions)
    after = _seg_mtimes(idx_dir)
    for f, mtime in survivors.items():
        assert f in after and after[f] == mtime, f"done segment rewritten: {f}"

    # killed buckets rebuilt, manifest complete again
    manifest2 = spark.read.parquet(os.path.join(idx_dir, "manifest"))
    assert sorted(r["bucket"] for r in manifest2.select("bucket").collect()) == all_buckets

    # resumed index answers queries identically to an uninterrupted build
    queries = spark.createDataFrame(tiny_queries[:10])
    got_ref = sorted(map(tuple, bm25_topk_segments(spark, ref_dir, queries, k=10).collect()))
    got_res = sorted(map(tuple, bm25_topk_segments(spark, idx_dir, queries, k=10).collect()))
    assert got_ref == got_res


def test_noop_resume_writes_nothing(spark, corpus_df, tmp_path):
    idx_dir = str(tmp_path / "noop")
    build_index(spark, corpus_df, idx_dir, bucket_size=250)
    files1 = _seg_mtimes(idx_dir)
    n_manifest1 = spark.read.parquet(os.path.join(idx_dir, "manifest")).count()
    build_index(spark, corpus_df, idx_dir, bucket_size=250, resume=True)
    assert _seg_mtimes(idx_dir) == files1, "no-op resume rewrote segment files"
    n_manifest2 = spark.read.parquet(os.path.join(idx_dir, "manifest")).count()
    assert n_manifest2 == n_manifest1, "no-op resume added manifest rows"
