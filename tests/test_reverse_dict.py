"""Reversed-term dictionary sidecar (`build_index(reverse_dict=True)`) —
Lucene's ReverseStringFilter: leading-wildcard expansion (`%ing`) must (1)
return exactly the full-scan answer, (2) run as a RANGE-PRUNED scan of the
rterm-sorted sidecar (pushed prefix predicates, plan-asserted), and (3)
survive the index lifecycle (append epochs rewrite the sidecar; merge
propagates it)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from colbert_spark.index.build import append_index, build_index
from colbert_spark.query.wand import IndexSearcher


@pytest.fixture(scope="module")
def rev_idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_rev"))
    build_index(
        spark, spark.createDataFrame(tiny_corpus), d, bucket_size=127,
        reverse_dict=True,
    )
    return d


def _vocab(spark, d):
    st = json.load(open(os.path.join(d, "stats.json")))
    return {
        r["term"]
        for r in spark.read.parquet(
            os.path.join(d, st.get("dict_dir", "term_dict"))
        ).collect()
    }


def test_leading_wildcard_matches_full_scan(spark, rev_idx):
    s = IndexSearcher(spark, rev_idx)
    vocab = _vocab(spark, rev_idx)
    for pat in ("%001", "%013", "%zzz", "%_042"):
        want = sorted(
            t
            for t in vocab
            if __import__("fnmatch").fnmatch(
                t, pat.replace("%", "*").replace("_", "?")
            )
        )
        assert s.expand_like(pat) == want, pat
    # the sidecar exists next to the dictionary
    assert os.path.isdir(os.path.join(rev_idx, "term_dict_rev"))


def test_sidecar_scan_pushes_reversed_prefix_range(spark, rev_idx):
    """The engine's reversed expansion must reach the parquet scan as a
    pushed rterm range (min/max-prunable on the rterm-sorted layout) — the
    whole point of the sidecar vs the full-dictionary LIKE scan."""
    s = IndexSearcher(spark, rev_idx)
    rsrc = s._reversed_dict()
    assert rsrc is not None
    # the exact frame _expand builds for '%001' → reversed pattern '100%'
    pred = (
        F.col("rterm").like("100%")
        & (F.col("rterm") >= "100")
        & (F.col("rterm") < "100" + "￿")
    )
    plan = (
        rsrc.filter(pred)
        .select("term")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(rterm,100)" in plan, plan
    assert "LessThan(rterm" in plan, plan


def test_without_sidecar_full_scan_same_answer(spark, tiny_corpus, tmp_path):
    d2 = str(tmp_path / "idx_norev")
    build_index(spark, spark.createDataFrame(tiny_corpus), d2, bucket_size=127)
    s_rev = IndexSearcher(
        spark, d2
    )  # no sidecar: falls back to the documented full scan
    assert not s_rev.stats.get("reverse_dict")
    assert s_rev._reversed_dict() is None
    # same expansions either way
    s_side = IndexSearcher(spark, d2)
    assert s_rev.expand_like("%01") == s_side.expand_like("%01")


def test_append_rewrites_sidecar(spark, tiny_corpus, rev_idx, tmp_path):
    import shutil

    d = str(tmp_path / "idx_rev_app")
    shutil.copytree(rev_idx, d)
    extra = tiny_corpus.iloc[:5].assign(
        url=lambda p: "x-" + p["url"],
        text=lambda p: p["text"] + " zzznewsuffixq",
    )
    stats = append_index(spark, spark.createDataFrame(extra), d)
    assert stats["reverse_dict"] is True
    side = os.path.join(d, stats["dict_dir"] + "_rev")
    assert os.path.isdir(side)
    s = IndexSearcher(spark, d)
    assert s.expand_like("%fixq") == ["zzznewsuffixq"]


def test_merge_propagates_sidecar(spark, tiny_corpus, tmp_path):
    from colbert_spark.index.merge import merge_indexes

    a, b = str(tmp_path / "ra"), str(tmp_path / "rb")
    out = str(tmp_path / "rmerged")
    half = len(tiny_corpus) // 2
    build_index(
        spark, spark.createDataFrame(tiny_corpus.iloc[:half]), a,
        bucket_size=127, reverse_dict=True,
    )
    build_index(
        spark, spark.createDataFrame(tiny_corpus.iloc[half:]), b,
        bucket_size=127, reverse_dict=True,
    )
    stats = merge_indexes(spark, [a, b], out)
    assert stats["reverse_dict"] is True
    assert os.path.isdir(os.path.join(out, "term_dict_rev"))
    s = IndexSearcher(spark, out)
    vocab = _vocab(spark, out)
    want = sorted(t for t in vocab if t.endswith("01"))
    assert s.expand_like("%01") == want
