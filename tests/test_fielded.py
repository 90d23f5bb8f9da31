"""Fielded (multi-field, single-directory) index build — the Lucene
field-qualified posting model (`build_index(fields=...)`): one physical
index whose terms are keyed f"{field}\\x1f{term}", whose dl stream stores
the FIELD length (per-field norms), and whose stats.json carries exact
per-field collection statistics. This is the storage layer behind the
single-index BM25F entry (`fts_bm25f_index`), replacing the previous
three-physical-index composition (cf. the reference's per-surface token
budgets, ``proj_conf/dense.yaml:6-8``)."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from colbert_spark.functions.tokenizer import tokens_col
from colbert_spark.index.build import FIELD_SEP, build_index

TITLE_LEN = 6


def _fielded_pages(spark, pdf):
    """title = first TITLE_LEN tokens, body = the rest (space-joined token
    lists re-tokenize identically under the grammar)."""
    toks = tokens_col("text")
    return spark.createDataFrame(pdf).select(
        "url",
        F.array_join(F.slice(toks, 1, TITLE_LEN), " ").alias("title"),
        F.array_join(F.slice(toks, TITLE_LEN + 1, F.size(toks)), " ").alias("body"),
    )


@pytest.fixture(scope="module")
def fielded_idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fielded") / "idx")
    pages = _fielded_pages(spark, tiny_corpus).cache()
    stats = build_index(
        spark, pages, d, bucket_size=97,
        fields=[("title", "title"), ("body", "body")],
    )
    return d, stats, pages


def test_field_stats_match_recount(spark, fielded_idx):
    """stats.json per-field avgdl/total_cf == a fresh corpus recount."""
    d, stats, pages = fielded_idx
    row = pages.select(
        F.sum(F.size(tokens_col("title"))).alias("t"),
        F.sum(F.size(tokens_col("body"))).alias("b"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats["fields"]["title"]["total_cf"] == int(row["t"])
    assert stats["fields"]["body"]["total_cf"] == int(row["b"])
    assert math.isclose(
        stats["fields"]["title"]["avgdl"], row["t"] / row["n"], rel_tol=1e-12
    )
    # global stats cover the concatenation
    assert stats["total_cf"] == int(row["t"]) + int(row["b"])
    assert stats["N"] == int(row["n"])


def test_dictionary_is_field_qualified(spark, fielded_idx):
    """Every dictionary term carries a field prefix; per-field df equals a
    scan recount (title terms: df over the first-TITLE_LEN-token slices)."""
    d, stats, pages = fielded_idx
    td = spark.read.parquet(os.path.join(d, "term_dict"))
    bad = td.filter(~F.col("term").contains(FIELD_SEP)).count()
    assert bad == 0
    fields = (
        td.select(F.substring_index("term", FIELD_SEP, 1).alias("f"))
        .distinct()
        .collect()
    )
    assert sorted(r["f"] for r in fields) == ["body", "title"]

    want = {
        r["term"]: r["df"]
        for r in pages.select(
            "url", F.explode(F.array_distinct(tokens_col("title"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    got = {
        r["term"]: r["df"]
        for r in td.filter(F.col("term").startswith("title" + FIELD_SEP))
        .select(
            F.substring_index("term", FIELD_SEP, -1).alias("term"), "df"
        )
        .collect()
    }
    assert got == want


def test_dl_stream_stores_field_length(spark, fielded_idx):
    """A qualified term's decoded postings carry the FIELD length, not the
    whole-document length — the per-field norm BM25F divides by."""
    from colbert_spark.operators.fts_documents import _field_postings
    from colbert_spark.query.wand import IndexSearcher

    d, stats, pages = fielded_idx
    s = IndexSearcher(spark, d)
    # pick a mid-df body term so the check spans several docs
    td = spark.read.parquet(os.path.join(d, "term_dict"))
    term = (
        td.filter(F.col("term").startswith("body" + FIELD_SEP))
        .filter((F.col("df") > 3) & (F.col("df") < 50))
        .orderBy("term")
        .first()["term"]
    )
    posts = {
        r["doc_id"]: r["doclen"]
        for r in _field_postings(spark, s, [term]).collect()
    }
    assert posts
    docs = spark.read.parquet(os.path.join(d, "docs"))
    lens = {
        r["doc_id"]: (r["len_body"], r["doclen"])
        for r in docs.filter(F.col("doc_id").isin(list(posts))).collect()
    }
    for doc_id, dl in posts.items():
        len_body, total = lens[doc_id]
        assert dl == len_body
        assert dl < total  # field length, not the concatenated doclen


def test_fielded_append_extends_field_stats(spark, fielded_idx, tiny_corpus):
    """Round 5: fielded indexes append (tests/test_append.py carries the
    rank-identity cases) — here, the epoch commits and rolls the per-field
    statistics forward exactly."""
    from colbert_spark.index.build import append_index

    d, stats0, _ = fielded_idx
    extra = _fielded_pages(
        spark,
        tiny_corpus.iloc[:5].assign(url=lambda p: "x-" + p["url"]),
    )
    stats1 = append_index(spark, extra, d)
    assert stats1["epochs"] == stats0["epochs"] + 1
    assert stats1["N"] == stats0["N"] + 5
    row = extra.select(
        F.sum(F.size(tokens_col("title"))).alias("t"),
        F.sum(F.size(tokens_col("body"))).alias("b"),
    ).collect()[0]
    assert (
        stats1["fields"]["title"]["total_cf"]
        == stats0["fields"]["title"]["total_cf"] + int(row["t"])
    )
    assert (
        stats1["fields"]["body"]["total_cf"]
        == stats0["fields"]["body"]["total_cf"] + int(row["b"])
    )


def test_fielded_merge_matches_whole_build(spark, tiny_corpus, tmp_path):
    """Two fielded half-corpus indexes merged == the whole fielded build:
    dictionary df/cf identical, per-field stats identical, and a qualified
    term's postings identical (joined on url across the doc-id re-base)."""
    from colbert_spark.index.merge import merge_indexes
    from colbert_spark.operators.fts_documents import _field_postings
    from colbert_spark.query.wand import IndexSearcher

    pdf = tiny_corpus.iloc[:200]
    half = 100
    fields = [("title", "title"), ("body", "body")]
    a, b_, whole, merged = (
        str(tmp_path / n) for n in ("a", "b", "whole", "merged")
    )
    build_index(spark, _fielded_pages(spark, pdf.iloc[:half]), a,
                bucket_size=97, fields=fields)
    build_index(spark, _fielded_pages(spark, pdf.iloc[half:]), b_,
                bucket_size=97, fields=fields)
    build_index(spark, _fielded_pages(spark, pdf), whole,
                bucket_size=97, fields=fields)
    mstats = merge_indexes(spark, [a, b_], merged, bucket_size=97)
    wstats = json.load(open(os.path.join(whole, "stats.json")))
    for f in ("title", "body"):
        assert mstats["fields"][f]["total_cf"] == wstats["fields"][f]["total_cf"]
        assert math.isclose(
            mstats["fields"][f]["avgdl"], wstats["fields"][f]["avgdl"],
            rel_tol=1e-12,
        )

    mdict = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(
            os.path.join(merged, mstats.get("dict_dir", "term_dict"))
        ).collect()
    }
    wdict = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(whole, "term_dict")).collect()
    }
    assert mdict == wdict

    term = sorted(t for t in wdict if t.startswith("body" + FIELD_SEP))[3]

    def by_url(idx_dir):
        s = IndexSearcher(spark, idx_dir)
        posts = _field_postings(spark, s, [term]).withColumnRenamed(
            "doc_id", "idx_doc"
        )
        docs = spark.read.parquet(
            os.path.join(idx_dir, s.stats.get("docs_dir", "docs"))
        ).select(F.col("doc_id").alias("idx_doc"), "url")
        return {
            r["url"]: (r["tf"], r["doclen"])
            for r in posts.join(docs, "idx_doc").collect()
        }

    assert by_url(merged) == by_url(whole)
