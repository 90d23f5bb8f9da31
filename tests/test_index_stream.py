"""Streaming index maintenance (`stream_append_index`): web_pages parquet
drops folded into a live index by a Structured Streaming foreachBatch sink.
Each run with the same checkpoint processes only files added since the last
run (file-source exactly-once), each non-empty micro-batch commits one
append epoch, and the final index answers queries identically (to
float-summation order) to a fresh build over the union — extending
test_append.py's batch contract to the continuous-feed shape.
"""

import json
import os

import pytest

from colbert_spark.index.build import build_index
from colbert_spark.query.wand import IndexSearcher
from colbert_spark.streaming.index_stream import (
    file_stream_source,
    stream_append_index,
)

K = 10


def _run_drain(spark, in_dir, index_dir, ckpt):
    q = stream_append_index(
        spark, file_stream_source(spark, in_dir), index_dir, ckpt
    )
    q.awaitTermination()


@pytest.fixture(scope="module")
def streamed(spark, tiny_corpus, tmp_path_factory):
    """Build on part A, then stream parts B and C in as two file drops with
    a shared checkpoint; returns (index_dir, fresh_dir)."""
    root = tmp_path_factory.mktemp("idx_stream")
    index_dir = str(root / "index")
    in_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    os.makedirs(in_dir)

    n = len(tiny_corpus)
    a, b, c = (
        tiny_corpus.iloc[: n * 3 // 5],
        tiny_corpus.iloc[n * 3 // 5 : n * 4 // 5],
        tiny_corpus.iloc[n * 4 // 5 :],
    )
    build_index(spark, spark.createDataFrame(a), index_dir, bucket_size=127)

    spark.createDataFrame(b[["url", "text"]]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run_drain(spark, in_dir, index_dir, ckpt)
    n_after_b = json.load(open(os.path.join(index_dir, "stats.json")))["N"]

    spark.createDataFrame(c[["url", "text"]]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run_drain(spark, in_dir, index_dir, ckpt)

    fresh_dir = str(root / "fresh")
    build_index(spark, spark.createDataFrame(tiny_corpus), fresh_dir, bucket_size=127)
    return index_dir, fresh_dir, len(a), len(b), n_after_b


def test_stream_appends_each_drop_once(spark, streamed, tiny_corpus):
    index_dir, _, n_a, n_b, n_after_b = streamed
    # first drain saw ONLY drop B (not a re-read of the base corpus)
    assert n_after_b == n_a + n_b
    stats = json.load(open(os.path.join(index_dir, "stats.json")))
    assert stats["N"] == len(tiny_corpus)
    assert stats["epochs"] == 3  # base build + one epoch per non-empty batch


def test_stream_rerun_with_no_new_files_is_noop(spark, streamed, tmp_path_factory):
    index_dir, _, *_ = streamed
    before = json.load(open(os.path.join(index_dir, "stats.json")))
    in_dir = os.path.join(os.path.dirname(index_dir), "incoming")
    ckpt = os.path.join(os.path.dirname(index_dir), "ckpt")
    _run_drain(spark, in_dir, index_dir, ckpt)
    after = json.load(open(os.path.join(index_dir, "stats.json")))
    assert after["N"] == before["N"] and after["epochs"] == before["epochs"]


def test_stream_result_matches_fresh_build(spark, streamed, tiny_queries):
    from test_append import _by_url, _compare_modulo_ties

    index_dir, fresh_dir, *_ = streamed
    queries = spark.createDataFrame(tiny_queries)
    got_s = _by_url(
        spark, index_dir, IndexSearcher(spark, index_dir).search(queries, k=K).collect()
    )
    got_f = _by_url(
        spark, fresh_dir, IndexSearcher(spark, fresh_dir).search(queries, k=K).collect()
    )
    _compare_modulo_ties(got_s, got_f)
