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
    # the block-copy path pads doc bases to bucket boundaries: N is the id
    # BOUND (includes padding holes); live_docs carries the real count and
    # prices idf/avgdl — the same mechanism expunge uses
    assert stats.get("live_docs", stats["N"]) == w["N"] == len(tiny_corpus)
    assert stats["N"] >= len(tiny_corpus)
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


def test_merge_refuses_in_place_output(spark, tmp_path):
    import pandas as pd

    pages = pd.DataFrame({"url": ["u0"], "text": ["hash join"]})
    pages2 = pd.DataFrame({"url": ["u1"], "text": ["sort merge"]})
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(pages), a, bucket_size=1)
    build_index(spark, spark.createDataFrame(pages2), b_, bucket_size=1)
    with pytest.raises(ValueError, match="in place"):
        merge_indexes(spark, [a, b_], a)


def test_merge_retry_into_same_output_is_clean(spark, tmp_path):
    """A re-run (or crash-retry) of merge into the SAME out_dir — even under
    a different shuffle partition count, which renames every task-local
    segment file — must wipe the first attempt's files instead of stacking
    duplicate postings next to them (the hazard ADVICE flagged: load_index
    reads every parquet under segments/)."""
    import pandas as pd

    from colbert_spark.index.inspect import index_fsck

    p1 = pd.DataFrame(
        {"url": [f"a{i}" for i in range(6)],
         "text": ["fast hash join"] * 3 + ["slow table scan"] * 3}
    )
    p2 = pd.DataFrame(
        {"url": [f"b{i}" for i in range(6)],
         "text": ["hash join wins"] * 3 + ["index seek"] * 3}
    )
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(p1), a, bucket_size=4)
    build_index(spark, spark.createDataFrame(p2), b_, bucket_size=4)
    out = str(tmp_path / "m")
    old_p = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        merge_indexes(spark, [a, b_], out)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        stats = merge_indexes(spark, [a, b_], out)  # the retry
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_p)
    assert index_fsck(spark, out, deep=True)["ok"]
    q = spark.createDataFrame([(0, "hash join")], "qid long, question string")
    rows = bm25_topk_segments(spark, out, q, k=12).collect()
    assert len(rows) == 6  # every doc containing hash or join, exactly once
    assert stats.get("live_docs", stats["N"]) == 12
    # manifest holds exactly one generation (mode=overwrite, not append)
    import pyspark.sql.functions as F

    man = spark.read.parquet(out + "/manifest")
    assert man.groupBy("bucket").count().agg(F.max("count")).collect()[0][0] == 1


def test_merge_after_expunge_counts_live_docs(
    spark, tiny_corpus, tiny_queries, tmp_path_factory
):
    """The delete → expunge → merge workflow the merge docstring prescribes:
    an expunged input has live_docs < N (holes in its id space). Merge must
    (a) accept it, (b) re-base on the id BOUND N, (c) compute avgdl/idf from
    LIVE counts — so the merged index scores identically to a fresh build
    over the surviving corpus."""
    import json
    import os

    import pandas as pd

    from colbert_spark.index.compact import compact_index
    from colbert_spark.index.delete import delete_docs

    base = tmp_path_factory.mktemp("merge_expunge")
    # doc_ids are dense-ranked by url: sort so positional indices == doc_ids
    pdf = tiny_corpus.sort_values("url").reset_index(drop=True)
    half = len(pdf) // 2
    a, b_ = str(base / "a"), str(base / "b")
    build_index(spark, spark.createDataFrame(pdf.iloc[:half]), a, bucket_size=97)
    build_index(spark, spark.createDataFrame(pdf.iloc[half:]), b_, bucket_size=97)
    dead = list(range(0, half, 5))
    delete_docs(spark, a, spark.createDataFrame([(d,) for d in dead], "doc_id long"))
    st_a = compact_index(spark, a, expunge_deletes=True)
    assert st_a["live_docs"] == half - len(dead)

    merged = str(base / "merged")
    stats = merge_indexes(spark, [a, b_], merged, bucket_size=97)
    assert stats["N"] >= len(pdf)  # id bound: Σ input N + bucket padding
    assert stats["live_docs"] == len(pdf) - len(dead)
    assert math.isclose(stats["avgdl"], stats["total_cf"] / stats["live_docs"])

    # oracle: fresh build over the survivors
    surv = pd.concat(
        [pdf.iloc[:half].drop(index=dead), pdf.iloc[half:]], ignore_index=True
    )
    fresh = str(base / "fresh")
    build_index(spark, spark.createDataFrame(surv), fresh, bucket_size=97)
    q = spark.createDataFrame(tiny_queries[:15])
    got = bm25_topk_segments(spark, merged, q, k=10).collect()
    want = bm25_topk_segments(spark, fresh, q, k=10).collect()
    murl = {r["doc_id"]: r["url"]
            for r in spark.read.parquet(merged + "/docs").collect()}
    furl = {r["doc_id"]: r["url"]
            for r in spark.read.parquet(fresh + "/docs").collect()}
    kg = sorted((r["qid"], r["rank"], murl[r["doc_id"]], round(r["score"], 9))
                for r in got)
    kw = sorted((r["qid"], r["rank"], furl[r["doc_id"]], round(r["score"], 9))
                for r in want)
    assert kg == kw and kg


def test_merge_block_copy_vs_compacting_identical(spark, tmp_path, tiny_queries):
    """The block-copy fast path and the compacting path must produce
    rank+score-identical indexes; mismatched bucket sizes must auto-fall
    back to compacting (and refuse a forced block_copy)."""
    import pandas as pd

    from colbert_spark.index.inspect import index_fsck
    from colbert_spark.sources.synth import synth_web_pages

    pdf = synth_web_pages(300)
    half = 150
    a, b_ = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(pdf.iloc[:half]), a, bucket_size=64)
    build_index(spark, spark.createDataFrame(pdf.iloc[half:]), b_, bucket_size=64)
    fast, slow = str(tmp_path / "fast"), str(tmp_path / "slow")
    st_f = merge_indexes(spark, [a, b_], fast, bucket_size=64)
    st_s = merge_indexes(spark, [a, b_], slow, bucket_size=64, block_copy=False)
    assert index_fsck(spark, fast, deep=True)["ok"]
    assert st_f.get("live_docs", st_f["N"]) == st_s.get("live_docs", st_s["N"]) == 300
    q = spark.createDataFrame(tiny_queries[:15])
    gf = bm25_topk_segments(spark, fast, q, k=10).collect()
    gs = bm25_topk_segments(spark, slow, q, k=10).collect()
    furl = {r["doc_id"]: r["url"]
            for r in spark.read.parquet(fast + "/docs").collect()}
    surl = {r["doc_id"]: r["url"]
            for r in spark.read.parquet(slow + "/docs").collect()}
    kf = sorted((r["qid"], r["rank"], furl[r["doc_id"]], round(r["score"], 9))
                for r in gf)
    ks = sorted((r["qid"], r["rank"], surl[r["doc_id"]], round(r["score"], 9))
                for r in gs)
    assert kf == ks and kf

    # mismatched bucket sizes: auto-fallback to compacting, forced copy fails
    c = str(tmp_path / "c")
    build_index(spark, spark.createDataFrame(
        pd.DataFrame({"url": ["zz0", "zz1"], "text": ["hash join", "scan"]})
    ), c, bucket_size=7)
    with pytest.raises(ValueError, match="block_copy"):
        merge_indexes(spark, [a, c], str(tmp_path / "x"),
                      bucket_size=64, block_copy=True)
    st_m = merge_indexes(spark, [a, c], str(tmp_path / "y"), bucket_size=64)
    assert st_m.get("live_docs", st_m["N"]) == half + 2
