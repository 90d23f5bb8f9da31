"""Sharded scatter-gather search (query/wand.py:sharded_bm25_topk): per-shard
top-k priced with GLOBAL statistics must merge to the single-index ranking
exactly — including when shards are deliberately UNEQUAL (different N, avgdl,
df per term), which is where shard-local pricing would diverge."""

import math

import pytest

from colbert_spark.index.build import build_index
from colbert_spark.query.wand import bm25_topk_segments, sharded_bm25_topk


@pytest.fixture(scope="module")
def uneven_shards(spark, tiny_corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("sharded")
    pdf = tiny_corpus
    cut = len(pdf) // 5  # 1:4 split — shard stats differ materially
    a, b_, whole = str(base / "a"), str(base / "b"), str(base / "whole")
    build_index(spark, spark.createDataFrame(pdf.iloc[:cut]), a, bucket_size=53)
    build_index(spark, spark.createDataFrame(pdf.iloc[cut:]), b_, bucket_size=97)
    build_index(spark, spark.createDataFrame(pdf), whole, bucket_size=97)
    return a, b_, whole


def test_sharded_matches_single_index(spark, uneven_shards, tiny_queries):
    a, b_, whole = uneven_shards
    q = spark.createDataFrame(tiny_queries)
    got = sharded_bm25_topk(spark, [a, b_], q, k=10).collect()
    want = bm25_topk_segments(spark, whole, q, k=10).collect()
    wurl = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(whole + "/docs").collect()
    }

    def bykey(rows, urlcol):
        out = {}
        for r in rows:
            out.setdefault(r["qid"], []).append(r)
        return {
            k: [(urlcol(r), r["score"]) for r in sorted(v, key=lambda r: r["rank"])]
            for k, v in out.items()
        }

    g = bykey(got, lambda r: r["url"])
    w = bykey(want, lambda r: wurl[r["doc_id"]])
    assert g.keys() == w.keys() and g
    for qid in w:
        assert [u for u, _ in g[qid]] == [u for u, _ in w[qid]], qid
        for (_, gs), (_, ws) in zip(g[qid], w[qid]):
            assert math.isclose(gs, ws, rel_tol=1e-9), qid


def test_sharded_refuses_mixed_analyzers(spark, tmp_path):
    import pandas as pd

    pages_a = pd.DataFrame({"url": ["a0"], "text": ["tables join"]})
    pages_b = pd.DataFrame({"url": ["b0"], "text": ["table joins"]})
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(pages_a), a, bucket_size=1)
    build_index(
        spark, spark.createDataFrame(pages_b), b_, bucket_size=1,
        analyzer="s_stem",
    )
    q = spark.createDataFrame([(0, "table")], "qid long, question string")
    with pytest.raises(ValueError, match="analyzer"):
        sharded_bm25_topk(spark, [a, b_], q)
