"""Incremental index extension (`append_index`): an index built in two
batches must answer queries identically (to float-summation order) to one
built fresh over the union — the idf-free block format's whole point is that
the N/df shift from new documents re-prices old blocks without rewriting
them. Also: committed appends are idempotent, and stats/dict merge exactly.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from colbert_spark.index.build import append_index, build_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.wand import IndexSearcher

K = 10


@pytest.fixture(scope="module")
def split_corpus(tiny_corpus):
    half = len(tiny_corpus) * 3 // 5
    return tiny_corpus.iloc[:half], tiny_corpus.iloc[half:]


@pytest.fixture(scope="module")
def appended_dir(spark, split_corpus, tmp_path_factory):
    base, extra = split_corpus
    d = str(tmp_path_factory.mktemp("idx_append"))
    build_index(spark, spark.createDataFrame(base), d, bucket_size=127)
    append_index(spark, spark.createDataFrame(extra), d)
    return d


@pytest.fixture(scope="module")
def fresh_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_fresh"))
    build_index(spark, spark.createDataFrame(tiny_corpus), d, bucket_size=127)
    return d


def _by_url(spark, index_dir, rows):
    """qid → [(url, round(score, 9))]: doc_ids are ASSIGNMENT-order (an
    appended index numbers late arrivals last, a fresh build numbers the
    whole corpus by url rank), so cross-index comparison goes through url.
    Rounding to 9 absorbs the ≤1-ulp float shifts from the appended
    dictionary's different term-id accumulation order."""
    id2url = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(f"{index_dir}/docs").select("doc_id", "url").collect()
    }
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append((id2url[r["doc_id"]], round(r["score"], 9)))
    return by_qid


def _compare_modulo_ties(a, f):
    """Same score multiset per qid; same url wherever the score is unique
    (exact ties at the top-k boundary may legitimately admit either member,
    because the deterministic tie-break key — doc_id — differs by design)."""
    assert a.keys() == f.keys()
    for qid in a:
        sa = sorted(s for _, s in a[qid])
        sf = sorted(s for _, s in f[qid])
        assert sa == sf, f"qid={qid}: score multisets differ"
        counts = {}
        for _, s in a[qid]:
            counts[s] = counts.get(s, 0) + 1
        ua = {(u, s) for u, s in a[qid] if counts[s] == 1}
        uf = {(u, s) for u, s in f[qid] if counts[s] == 1}
        assert ua == uf, f"qid={qid}: unique-score urls differ"


def test_append_stats_match_fresh(spark, appended_dir, fresh_dir):
    a = json.load(open(os.path.join(appended_dir, "stats.json")))
    f = json.load(open(os.path.join(fresh_dir, "stats.json")))
    assert a["N"] == f["N"]
    assert a["n_terms"] == f["n_terms"]
    assert a["total_cf"] == f["total_cf"]
    assert abs(a["avgdl"] - f["avgdl"]) < 1e-9
    assert a["epochs"] == 2 and a["dict_dir"] == "term_dict_e1"


def test_append_dict_merges_exactly(spark, appended_dir, fresh_dir):
    """df/cf per term identical to the fresh build's dictionary (term_ids
    differ for late-arriving vocabulary — ids are assignment order)."""
    a = spark.read.parquet(os.path.join(appended_dir, "term_dict_e1"))
    f = spark.read.parquet(os.path.join(fresh_dir, "term_dict"))
    diff = (
        a.select("term", "df", "cf")
        .exceptAll(f.select("term", "df", "cf"))
        .count()
    )
    assert diff == 0
    assert a.count() == f.count()


def test_append_rank_identity_vs_fresh_and_oracle(
    spark, appended_dir, fresh_dir, tiny_corpus, tiny_queries
):
    queries = spark.createDataFrame(tiny_queries)
    got_a = _by_url(
        spark, appended_dir, IndexSearcher(spark, appended_dir).search(queries, k=K).collect()
    )
    got_f = _by_url(
        spark, fresh_dir, IndexSearcher(spark, fresh_dir).search(queries, k=K).collect()
    )
    _compare_modulo_ties(got_a, got_f)

    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    golden = {}
    for qid, q in zip(tiny_queries["qid"], tiny_queries["question"]):
        golden[qid] = [
            (ordered["url"].iloc[d], round(s, 9)) for d, s in oracle.topk(q, K)
        ]
    golden = {q: v for q, v in golden.items() if v}
    _compare_modulo_ties(got_a, golden)


def test_append_committed_is_noop(spark, appended_dir, split_corpus):
    _, extra = split_corpus
    before = json.load(open(os.path.join(appended_dir, "stats.json")))
    out = append_index(spark, spark.createDataFrame(extra), appended_dir)
    assert out["N"] == before["N"] and out["epochs"] == before["epochs"]


# --- block-max soundness across avgdl-raising appends -----------------------
#
# Stored max_unit is exact at a block's ENCODE-time avgdl; unit scores GROW
# with avgdl, so appending longer documents (avgdl ↑) makes raw stored maxima
# under-estimate current scores — the MaxScore pruning path would silently
# drop true top-k docs. The kernel inflates maxima by
# max(1, avgdl_now / min_enc_avgdl), which is a proven upper bound
# (unit_new/unit_old ≤ avgdl_new/avgdl_old).


def _page(i: int, text: str) -> dict:
    import pandas as pd

    return {
        "url": f"https://avgdl.example/{i:03d}",
        "warc_ts": pd.Timestamp("2024-01-01"),
        "html": f"<html><body><p>{text}</p></body></html>".encode(),
        "text": text,
        "lang": "en",
    }


@pytest.fixture(scope="module")
def avgdl_shift_dir(spark, tmp_path_factory):
    """Base build over SHORT docs, append of LONG docs: avgdl rises ~20×."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    words = [f"w{j:02d}" for j in range(30)]
    base = pd.DataFrame(
        [_page(i, " ".join(rng.choice(words, 8))) for i in range(40)]
    )
    extra = pd.DataFrame(
        [_page(100 + i, " ".join(rng.choice(words, 200))) for i in range(40)]
    )
    d = str(tmp_path_factory.mktemp("idx_avgdl"))
    build_index(spark, spark.createDataFrame(base), d, bucket_size=16)
    append_index(spark, spark.createDataFrame(extra), d)
    return d


def test_append_tracks_min_enc_avgdl(avgdl_shift_dir):
    stats = json.load(open(os.path.join(avgdl_shift_dir, "stats.json")))
    assert stats["min_enc_avgdl"] < stats["avgdl"]  # avgdl rose across epochs


def test_block_max_bound_sound_after_avgdl_raise(spark, avgdl_shift_dir):
    """Every block's exact unit max at CURRENT avgdl ≤ the inflated bound —
    and at least one block VIOLATES the raw (un-inflated) stored max, proving
    the inflation is load-bearing, not vacuous."""
    from colbert_spark.index.codec import decode_block

    s = IndexSearcher(spark, avgdl_shift_dir)
    k1, b, avgdl = s.stats["k1"], s.stats["b"], s.stats["avgdl"]
    scale = max(1.0, avgdl / s.stats["min_enc_avgdl"])
    raw_violations = 0
    for r in s.segments.toPandas().itertuples():
        tfs = decode_block(r.tf_bytes).astype(float)
        dls = decode_block(r.dl_bytes).astype(float)
        umax = float((tfs * (k1 + 1) / (tfs + k1 * (1 - b + b * dls / avgdl))).max())
        assert umax <= r.max_unit * scale + 1e-12
        if umax > r.max_unit + 1e-12:
            raw_violations += 1
    assert raw_violations > 0


def test_pruned_equals_dense_after_avgdl_raise(spark, avgdl_shift_dir):
    """MaxScore (pruned, single-query) must return exactly what the exact
    dense path returns after the avgdl shift."""
    import pandas as pd

    qs = pd.DataFrame(
        {
            "qid": [0, 1, 2, 3],
            "question": ["w00 w07", "w13", "w04 w19 w22", "w29 w01 w01"],
        }
    )
    searcher = IndexSearcher(spark, avgdl_shift_dir)
    queries = spark.createDataFrame(qs)
    dense = searcher.search(queries, k=5, dense_min=1).collect()
    pruned = searcher.search(queries, k=5, dense_min=10**9).collect()
    key = lambda rows: sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 10)) for r in rows)  # noqa: E731
    assert key(dense) == key(pruned)


# --- fielded (single-index BM25F) appends --------------------------------


def _fielded_pages(spark, pdf, title_len=6):
    from colbert_spark.functions.tokenizer import tokens_col

    toks = tokens_col("text")
    return spark.createDataFrame(pdf).select(
        "url",
        F.array_join(F.slice(toks, 1, title_len), " ").alias("title"),
        F.array_join(
            F.slice(toks, title_len + 1, F.size(toks)), " "
        ).alias("body"),
    )


@pytest.fixture(scope="module")
def fielded_append_pair(spark, tiny_corpus, split_corpus, tmp_path_factory):
    from colbert_spark.index.build import FIELD_SEP  # noqa: F401

    base, extra = split_corpus
    fields = [("title", "title"), ("body", "body")]
    d_app = str(tmp_path_factory.mktemp("idx_fapp"))
    build_index(
        spark, _fielded_pages(spark, base), d_app, bucket_size=127,
        fields=fields,
    )
    append_index(spark, _fielded_pages(spark, extra), d_app)
    d_fresh = str(tmp_path_factory.mktemp("idx_ffresh"))
    build_index(
        spark, _fielded_pages(spark, tiny_corpus), d_fresh, bucket_size=127,
        fields=fields,
    )
    return d_app, d_fresh


def test_fielded_append_stats_match_fresh(spark, fielded_append_pair):
    """N, n_terms and the per-field exact statistics of base+append equal a
    fresh fielded build over the union — field avgdl rolls forward."""
    import math

    d_app, d_fresh = fielded_append_pair
    a = json.load(open(os.path.join(d_app, "stats.json")))
    f = json.load(open(os.path.join(d_fresh, "stats.json")))
    assert a["N"] == f["N"]
    assert a["n_terms"] == f["n_terms"]
    assert a["total_cf"] == f["total_cf"]
    for fld in ("title", "body"):
        assert a["fields"][fld]["total_cf"] == f["fields"][fld]["total_cf"], fld
        assert math.isclose(
            a["fields"][fld]["avgdl"], f["fields"][fld]["avgdl"], rel_tol=1e-12
        ), fld
    assert a["epochs"] == 2 and f["epochs"] == 1


def test_fielded_append_rank_identity_vs_fresh(spark, fielded_append_pair):
    """Field-qualified retrieval (the BM25F substrate: scored disjunction of
    f"{field}\\x1fterm" postings, dl = field length) over base+append must
    rank identically to the fresh fielded build — the cross-index compare
    goes through url (doc_ids are assignment-order)."""
    from colbert_spark.index.build import FIELD_SEP

    d_app, d_fresh = fielded_append_pair
    queries = []
    for qid, toks in enumerate(
        [["term00001"], ["term00002", "term00005"], ["term00010", "term00001"]]
    ):
        scored = [
            (fld + FIELD_SEP + t, 1.0)
            for t in toks
            for fld in ("title", "body")
        ]
        queries.append((qid, scored, [], []))
    rows_a = IndexSearcher(spark, d_app).search_compiled(queries, k=K).collect()
    rows_f = IndexSearcher(spark, d_fresh).search_compiled(queries, k=K).collect()
    a = _by_url(spark, d_app, rows_a)
    f = _by_url(spark, d_fresh, rows_f)
    assert a and any(a.values())
    _compare_modulo_ties(a, f)


def test_fielded_append_requires_recorded_source_cols(spark, tmp_path):
    """A fielded stats.json without fields[*].col (legacy index) must fail
    the append loudly, not corrupt field statistics."""
    d = str(tmp_path / "idx_legacy_fielded")
    fields = [("title", "title"), ("body", "body")]
    pages = _fielded_pages(
        spark,
        __import__("pandas").DataFrame(
            {
                "url": [f"https://ex.com/{i:04d}" for i in range(30)],
                "text": [f"alpha beta doc{i} gamma delta" for i in range(30)],
            }
        ),
    )
    build_index(spark, pages, d, bucket_size=16, fields=fields)
    st = json.load(open(os.path.join(d, "stats.json")))
    for meta in st["fields"].values():
        meta.pop("col", None)  # simulate a pre-round-5 fielded index
    with open(os.path.join(d, "stats.json"), "w") as fh:
        json.dump(st, fh)
    with pytest.raises(ValueError, match="col"):
        append_index(spark, pages.limit(5), d)
