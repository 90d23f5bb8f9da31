"""Index merging (index/merge.py): two independently-built shard indexes
fused with merge_indexes must answer queries rank-identically to one index
built over the whole corpus — scores included (same idf, same avgdl, same
doclens), because the merged statistics are exact sums."""

import math

import pytest

from colbert_spark.index.build import build_index
from colbert_spark.index.merge import merge_indexes
from colbert_spark.query.wand import bm25_topk_segments


@pytest.fixture(scope="module")
def merged_vs_whole(spark, tiny_corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    pdf = tiny_corpus
    half = len(pdf) // 2
    a, b_, whole = str(base / "a"), str(base / "b"), str(base / "whole")
    build_index(spark, spark.createDataFrame(pdf.iloc[:half]), a, bucket_size=97)
    build_index(spark, spark.createDataFrame(pdf.iloc[half:]), b_, bucket_size=97)
    build_index(spark, spark.createDataFrame(pdf), whole, bucket_size=97)
    merged = str(base / "merged")
    stats = merge_indexes(spark, [a, b_], merged, bucket_size=97)
    return merged, whole, stats


def test_merge_stats_are_exact_sums(spark, merged_vs_whole, tiny_corpus):
    import json
    import os

    merged, whole, stats = merged_vs_whole
    w = json.load(open(os.path.join(whole, "stats.json")))
    assert stats["N"] == w["N"] == len(tiny_corpus)
    assert stats["total_cf"] == w["total_cf"]
    assert stats["n_terms"] == w["n_terms"]
    assert math.isclose(stats["avgdl"], w["avgdl"], rel_tol=1e-12)


def test_merge_rank_identity_vs_whole_build(spark, merged_vs_whole, tiny_queries):
    merged, whole, _ = merged_vs_whole
    q = spark.createDataFrame(tiny_queries)
    got = bm25_topk_segments(spark, merged, q, k=10).collect()
    want = bm25_topk_segments(spark, whole, q, k=10).collect()

    def bykey(rows):
        out = {}
        for r in rows:
            out.setdefault(r["qid"], []).append(r)
        return {
            k: [(r["doc_id"], r["score"]) for r in sorted(v, key=lambda r: r["rank"])]
            for k, v in out.items()
        }

    g, w = bykey(got), bykey(want)
    assert g.keys() == w.keys() and g
    # doc ids in the merged index are (shard, re-based id); compare through
    # the url mapping: doc_id order must agree after mapping both to urls
    murl = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(merged + "/docs").collect()
    }
    wurl = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(whole + "/docs").collect()
    }
    for qid in w:
        gu = [(murl[d], s) for d, s in g[qid]]
        wu = [(wurl[d], s) for d, s in w[qid]]
        assert [u for u, _ in gu] == [u for u, _ in wu], qid
        for (_, gs), (_, ws) in zip(gu, wu):
            assert math.isclose(gs, ws, rel_tol=1e-9), qid


def test_merge_refuses_mismatched_inputs(spark, tmp_path):
    import pandas as pd

    pages = pd.DataFrame(
        {"url": ["x0", "x1"], "text": ["tables join", "table joins"]}
    )
    plain, stemmed = str(tmp_path / "p"), str(tmp_path / "s")
    build_index(spark, spark.createDataFrame(pages), plain, bucket_size=2)
    build_index(
        spark, spark.createDataFrame(pages), stemmed, bucket_size=2,
        analyzer="s_stem",
    )
    with pytest.raises(ValueError, match="analyzer"):
        merge_indexes(spark, [plain, stemmed], str(tmp_path / "out"))


def test_merge_refuses_duplicate_urls(spark, tmp_path):
    import pandas as pd

    pages = pd.DataFrame({"url": ["dup"], "text": ["hash join"]})
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(pages), a, bucket_size=1)
    build_index(spark, spark.createDataFrame(pages), b_, bucket_size=1)
    with pytest.raises(ValueError, match="unique"):
        merge_indexes(spark, [a, b_], str(tmp_path / "out"))


def test_positional_merge_preserves_phrases(spark, tmp_path):
    import pandas as pd

    from colbert_spark.query.phrase import phrase_match_segments

    p1 = pd.DataFrame(
        {"url": ["a0", "a1"],
         "text": ["fast hash join wins", "slow scan again"]}
    )
    p2 = pd.DataFrame(
        {"url": ["b0", "b1"],
         "text": ["the hash join is here", "hash there join apart"]}
    )
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(p1), a, bucket_size=2, positions=True)
    build_index(spark, spark.createDataFrame(p2), b_, bucket_size=2, positions=True)
    merged = str(tmp_path / "m")
    merge_indexes(spark, [a, b_], merged)
    phrases = spark.createDataFrame([(0, "hash join")], "phrase_id long, phrase string")
    hits = phrase_match_segments(spark, merged, phrases).collect()
    urls = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(merged + "/docs").collect()
    }
    got = sorted(urls[r["doc_id"]] for r in hits)
    assert got == ["a0", "b0"]  # adjacency preserved; "hash there join" is not a hit
