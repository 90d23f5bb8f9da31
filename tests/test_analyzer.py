"""Index-level analysis chain (functions/analyzer.py): the S-stemmer must
(1) agree across its three engine spellings, (2) make a stemmed index
rank-identical to explicit pre-stemming, and (3) survive append epochs."""

import duckdb
import pandas as pd
import pytest

from colbert_spark.functions.analyzer import (
    duckdb_stem_sql,
    py_analyze,
    py_s_stem,
    stem_terms_col,
)
from colbert_spark.functions.tokenizer import py_tokenize

WORDS = [
    "tables", "queries", "babies", "toes", "goes", "does", "bus", "pass",
    "ss", "us", "is", "as", "s", "es", "ies", "aies", "eies", "classes",
    "boxes", "stream", "data", "values", "hashes", "issues", "statuses",
    "axes", "gas", "its", "caries", "shoes", "a1s", "99s",
]


def test_s_stem_three_engines_agree(spark):
    py = [py_s_stem(w) for w in WORDS]
    duck = duckdb.execute(
        f"select {duckdb_stem_sql('$w')}", {"w": WORDS}
    ).fetchone()[0]
    assert list(duck) == py
    row = (
        spark.createDataFrame([(WORDS,)], "terms array<string>")
        .select(stem_terms_col("terms").alias("out"))
        .collect()[0]
    )
    assert list(row["out"]) == py


def test_s_stem_rules():
    # Harman's three rules, in order, with the length-3 guard on rule 3
    assert py_s_stem("queries") == "query"  # ies → y
    # exceptions leave the word UNCHANGED (no fall-through to shorter rules)
    assert py_s_stem("eies") == "eies" and py_s_stem("aies") == "aies"
    assert py_s_stem("boxes") == "boxe"  # es → e (drop one s)
    assert py_s_stem("toes") == "toes" and py_s_stem("bees") == "bees"
    assert py_s_stem("tables") == "table"  # plain s
    assert py_s_stem("bus") == "bus" and py_s_stem("pass") == "pass"
    assert py_s_stem("is") == "is"  # guard: never stem to length < 2


# a tiny corpus where plurals matter: urls fixed, text mixes singular/plural
_PAGES = [
    ("u0", "the tables join fast"),
    ("u1", "a table joins the stream"),
    ("u2", "queries scan windows"),
    ("u3", "the query scans a window"),
    ("u4", "values values value"),
    ("u5", "hash join hash"),
]
_QUERIES = [(0, "tables"), (1, "queries windows"), (2, "joins"), (3, "value")]


@pytest.fixture(scope="module")
def stem_indexes(spark, tmp_path_factory):
    """(analyzed_index, prestemmed_index): the first is built with
    analyzer='s_stem' on raw text; the second has NO analyzer but its text
    was pre-stemmed token-by-token with py_s_stem. Identical posting
    structures by construction if the JVM chain matches the Python one."""
    from colbert_spark.index.build import build_index

    base = tmp_path_factory.mktemp("stem_idx")
    raw = spark.createDataFrame(_PAGES, "url string, text string")
    a_dir = str(base / "analyzed")
    build_index(spark, raw, a_dir, bucket_size=3, analyzer="s_stem")

    pre_rows = [
        (u, " ".join(py_analyze(py_tokenize(t), "s_stem"))) for u, t in _PAGES
    ]
    pre = spark.createDataFrame(pre_rows, "url string, text string")
    p_dir = str(base / "prestemmed")
    build_index(spark, pre, p_dir, bucket_size=3)
    return a_dir, p_dir


def test_stemmed_index_stats_record_analyzer(spark, stem_indexes):
    import json
    import os

    a_dir, p_dir = stem_indexes
    a = json.load(open(os.path.join(a_dir, "stats.json")))
    p = json.load(open(os.path.join(p_dir, "stats.json")))
    assert a["analyzer"] == "s_stem" and p["analyzer"] is None
    # identical collection statistics: stemming is a bijection on this corpus
    assert a["N"] == p["N"] == len(_PAGES)
    assert a["total_cf"] == p["total_cf"] > 0
    assert a["n_terms"] == p["n_terms"]


def test_stemmed_index_rank_identity_vs_prestemmed(spark, stem_indexes):
    from colbert_spark.query.wand import bm25_topk_segments

    a_dir, p_dir = stem_indexes
    raw_q = spark.createDataFrame(_QUERIES, "qid long, question string")
    # the analyzed index takes RAW plural questions; the pre-stemmed index
    # needs the stemmed spellings (it has no analyzer to apply)
    stem_q = spark.createDataFrame(
        [(qid, " ".join(py_analyze(py_tokenize(q), "s_stem")))
         for qid, q in _QUERIES],
        "qid long, question string",
    )
    got = bm25_topk_segments(spark, a_dir, raw_q, k=10).orderBy("qid", "rank")
    want = bm25_topk_segments(spark, p_dir, stem_q, k=10).orderBy("qid", "rank")
    g = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in got.collect()]
    w = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in want.collect()]
    assert g == w and len(g) > 0
    # sanity: plural query actually matched singular docs
    assert any(r[0] == 0 for r in g)


def test_point_path_applies_analyzer(spark, stem_indexes):
    from colbert_spark.query.wand import IndexSearcher

    a_dir, _ = stem_indexes
    s = IndexSearcher(spark, a_dir)
    hits = s.search_point("tables", k=10)
    assert len(hits) > 0  # 'tables' stems to 'table' which is in-vocabulary
    hits2 = s.search_point("table", k=10)
    assert list(hits["doc_id"]) == list(hits2["doc_id"])


def test_append_epoch_inherits_analyzer(spark, stem_indexes, tmp_path):
    import shutil

    from colbert_spark.index.build import append_index
    from colbert_spark.query.wand import bm25_topk_segments

    a_dir, _ = stem_indexes
    idx = str(tmp_path / "appended")
    shutil.copytree(a_dir, idx)
    new = spark.createDataFrame(
        [("u6", "streams merge sorts")], "url string, text string"
    )
    append_index(spark, new, idx)
    q = spark.createDataFrame([(0, "streams"), (1, "sort")], "qid long, question string")
    rows = bm25_topk_segments(spark, idx, q, k=10).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r["doc_id"])
    # the appended doc (id 6) is reachable via its STEMMED terms from both
    # a plural query (query-side stemming) and a singular one (doc-side)
    assert 6 in by_qid.get(0, []) and 6 in by_qid.get(1, [])


def test_positional_paths_apply_analyzer(spark, tmp_path):
    """Phrase / NEAR / point paths on a POSITIONAL stemmed index must stem
    query tokens: a plural phrase matches the singular doc stream, and
    positions are post-filter offsets on both sides."""
    from colbert_spark.index.build import build_index
    from colbert_spark.query.phrase import PositionalSearcher

    pages = [
        ("u0", "fast tables join wins"),
        ("u1", "the table joins a stream"),
        ("u2", "tables apart from join"),
    ]
    idx = str(tmp_path / "pstem")
    build_index(
        spark, spark.createDataFrame(pages, "url string, text string"),
        idx, bucket_size=2, positions=True, analyzer="s_stem",
    )
    s = PositionalSearcher(spark, idx)
    # plural phrase "tables joins" stems to "table join": adjacent in u0
    # ("tables join") and u1 ("table joins"), NOT in u2 ("tables ... join")
    phrases = spark.createDataFrame(
        [(0, "tables joins")], "phrase_id long, phrase string"
    )
    hits = sorted(r["doc_id"] for r in s.phrase(phrases).collect())
    urls = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(idx + "/docs").collect()
    }
    assert sorted(urls[d] for d in hits) == ["u0", "u1"]
    # point path agrees
    pp = s.phrase_point("tables joins")
    assert sorted(urls[d] for d in pp["doc_id"]) == ["u0", "u1"]
    # NEAR with plural sides
    pairs = spark.createDataFrame(
        [(0, "tables", "streams")], "pair_id long, t1 string, t2 string"
    )
    near = s.near(pairs, window=4).collect()
    assert sorted(urls[r["doc_id"]] for r in near) == ["u1"]
