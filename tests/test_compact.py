"""Segment compaction (`compact_index`): a fragmented index (small buckets,
multiple append epochs) must answer queries IDENTICALLY after compaction,
with strictly fewer block rows; epoch-preserving mode must keep every
time-travel snapshot exact, and full-merge mode must keep the live view
exact while upgrading the payload format to v3."""

import json
import os

import pytest

from colbert_spark.index.build import append_index, build_index
from colbert_spark.index.compact import compact_index
from colbert_spark.query.wand import IndexSearcher

K = 10


def _topk_rows(spark, index_dir, queries, **kw):
    rows = IndexSearcher(spark, index_dir, **kw).search(queries, k=K).collect()
    return sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 10)) for r in rows
    )


@pytest.fixture()
def fragmented_dir(spark, tiny_corpus, tmp_path_factory):
    """3 epochs over tiny buckets ⇒ heavy sub-split + epoch fragmentation."""
    a = tiny_corpus.iloc[:400]
    b = tiny_corpus.iloc[400:700]
    c = tiny_corpus.iloc[700:]
    d = str(tmp_path_factory.mktemp("idx_frag"))
    build_index(spark, spark.createDataFrame(a), d, bucket_size=97)
    append_index(spark, spark.createDataFrame(b), d)
    append_index(spark, spark.createDataFrame(c), d)
    return d


def test_compact_preserves_results_and_snapshots(
    spark, fragmented_dir, tiny_queries
):
    queries = spark.createDataFrame(tiny_queries[:20])
    before_live = _topk_rows(spark, fragmented_dir, queries)
    before_e0 = _topk_rows(spark, fragmented_dir, queries, as_of_epoch=0)
    before_e1 = _topk_rows(spark, fragmented_dir, queries, as_of_epoch=1)
    stats_pre = json.load(open(os.path.join(fragmented_dir, "stats.json")))

    stats = compact_index(spark, fragmented_dir, preserve_epochs=True)

    assert stats["n_blocks_after"] < stats["n_blocks_before"]
    assert stats["seg_dir"] == "segments_c1"
    assert not os.path.exists(os.path.join(fragmented_dir, "segments"))
    # postings conserved, format unchanged
    assert stats["segver"] == stats_pre["segver"]

    assert _topk_rows(spark, fragmented_dir, queries) == before_live
    assert _topk_rows(spark, fragmented_dir, queries, as_of_epoch=0) == before_e0
    assert _topk_rows(spark, fragmented_dir, queries, as_of_epoch=1) == before_e1


def test_compact_full_merge_upgrades_and_drops_old_snapshots(
    spark, fragmented_dir, tiny_queries
):
    queries = spark.createDataFrame(tiny_queries[:20])
    before_live = _topk_rows(spark, fragmented_dir, queries)

    stats = compact_index(spark, fragmented_dir, preserve_epochs=False)

    assert stats["segver"] == 3
    assert _topk_rows(spark, fragmented_dir, queries) == before_live
    # epoch history collapses to the merged baseline: epochs resets to 1,
    # e0 becomes (and equals) the live view, e1+ are gone
    assert stats["epochs"] == 1
    assert os.path.exists(os.path.join(fragmented_dir, "epoch_stats", "e0.json"))
    assert not os.path.exists(os.path.join(fragmented_dir, "epoch_stats", "e1.json"))
    assert _topk_rows(spark, fragmented_dir, queries, as_of_epoch=0) == before_live


def test_compact_merges_runs_into_full_blocks(spark, fragmented_dir):
    """Full merge leaves every (term_id, bucket) with at most one short
    (non-128) block — the defragmentation actually happened."""
    from pyspark.sql import functions as F

    compact_index(spark, fragmented_dir, preserve_epochs=False)
    stats = json.load(open(os.path.join(fragmented_dir, "stats.json")))
    seg = spark.read.parquet(os.path.join(fragmented_dir, stats["seg_dir"]))
    short = (
        seg.filter(F.col("n") < 128)
        .groupBy("term_id", "bucket")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert short == 0


def test_append_after_compaction(spark, tiny_corpus, tiny_queries, tmp_path_factory):
    """The compacted tree stays appendable: a later epoch lands in the NEW
    seg_dir, and score multisets match a never-compacted index over the
    same final corpus (doc_ids differ by assignment order, so compare
    per-qid score multisets — the same contract test_append uses)."""
    d = str(tmp_path_factory.mktemp("idx_compact_append"))
    build_index(spark, spark.createDataFrame(tiny_corpus.iloc[:400]), d, bucket_size=97)
    append_index(spark, spark.createDataFrame(tiny_corpus.iloc[400:700]), d)
    compact_index(spark, d, preserve_epochs=True)
    append_index(spark, spark.createDataFrame(tiny_corpus.iloc[700:]), d)
    # the post-compaction epoch's files live in the new tree
    stats = json.load(open(os.path.join(d, "stats.json")))
    assert stats["seg_dir"] == "segments_c1" and stats["epochs"] == 3

    twin = str(tmp_path_factory.mktemp("idx_compact_twin"))
    build_index(spark, spark.createDataFrame(tiny_corpus), twin, bucket_size=97)
    queries = spark.createDataFrame(tiny_queries[:20])
    got = _topk_rows(spark, d, queries)
    want = _topk_rows(spark, twin, queries)
    score_multiset = lambda rows: sorted((q, round(s, 6)) for q, _, _, s in rows)  # noqa: E731
    assert score_multiset(got) == score_multiset(want)


def test_streaming_compaction_identical_to_in_memory(
    spark, fragmented_dir, tiny_queries
):
    """The streaming kernel (sorted partitions, slab re-encode, incremental
    per-cell writers — the bounded-memory path for soak-scale partitions)
    must produce an index EQUIVALENT to the in-memory kernel: identical
    block-level content (term/doc/payload multisets), identical results on
    the live view and every epoch snapshot, fsck-clean."""
    import shutil

    from pyspark.sql import functions as F

    from colbert_spark.index.inspect import index_fsck

    queries = spark.createDataFrame(tiny_queries[:20])
    twin = fragmented_dir + "_twin"
    shutil.copytree(fragmented_dir, twin)

    compact_index(spark, fragmented_dir, preserve_epochs=True, streaming=False)
    compact_index(spark, twin, preserve_epochs=True, streaming=True)

    st_a = json.load(open(os.path.join(fragmented_dir, "stats.json")))
    st_b = json.load(open(os.path.join(twin, "stats.json")))
    assert st_a["n_blocks_after"] == st_b["n_blocks_after"]

    def block_multiset(d, st):
        seg = spark.read.parquet(os.path.join(d, st["seg_dir"]))
        return sorted(
            (
                r["bucket"], r["term_id"], r["first_doc"], r["last_doc"],
                r["n"], bytes(r["doc_bytes"]), bytes(r["tf_bytes"]),
                bytes(r["dl_bytes"]),
            )
            for r in seg.select(
                "bucket", "term_id", "first_doc", "last_doc", "n",
                "doc_bytes", "tf_bytes", "dl_bytes",
            ).collect()
        )

    assert block_multiset(fragmented_dir, st_a) == block_multiset(twin, st_b)
    for kw in ({}, {"as_of_epoch": 0}, {"as_of_epoch": 1}):
        assert _topk_rows(spark, fragmented_dir, queries, **kw) == _topk_rows(
            spark, twin, queries, **kw
        )
    res = index_fsck(spark, twin, deep=True)
    assert res["ok"], res
