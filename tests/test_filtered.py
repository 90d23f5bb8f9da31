"""Filtered retrieval: `IndexSearcher.search_filtered` must rank exactly the
allowed subset (corpus-wide idf/avgdl), matching a pure-Python oracle whose
exhaustive scores are filtered before top-k — including boundary cases
(allow-everything ≡ plain search, allow-nothing ≡ no rows). The allowed set
travels through the cogroup exchange keyed by the index's own bucket
function, never the driver."""

import math

import pytest

from colbert_spark.index.build import build_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.wand import IndexSearcher

K = 10


@pytest.fixture(scope="module")
def fidx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_filt"))
    build_index(spark, spark.createDataFrame(tiny_corpus), d, bucket_size=127)
    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    return d, oracle, len(ordered)


def _golden_filtered(oracle, question, allowed, k=K):
    scores = oracle.score_all(question)
    ranked = sorted(
        ((d, s) for d, s in scores.items() if d in allowed),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return ranked[:k]


def _run(spark, d, queries_df, allowed_ids):
    allowed_df = spark.createDataFrame([(int(x),) for x in allowed_ids], "doc_id long")
    return IndexSearcher(spark, d).search_filtered(queries_df, allowed_df, k=K).collect()


def test_filtered_matches_oracle(spark, fidx, tiny_queries):
    d, oracle, n = fidx
    allowed = set(range(0, n, 2))  # every even doc
    qdf = spark.createDataFrame(tiny_queries[:15])
    rows = _run(spark, d, qdf, allowed)
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, q in zip(tiny_queries["qid"][:15], tiny_queries["question"][:15]):
        want = _golden_filtered(oracle, q, allowed)
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], f"qid={qid}"
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9)
        assert all(r["doc_id"] % 2 == 0 for r in got)


def test_allow_everything_equals_plain_search(spark, fidx, tiny_queries):
    d, _, n = fidx
    qdf = spark.createDataFrame(tiny_queries[:8])
    filt = _run(spark, d, qdf, range(n))
    plain = IndexSearcher(spark, d).search(qdf, k=K).collect()
    key = lambda rows: sorted((r["qid"], r["rank"], r["doc_id"]) for r in rows)
    assert key(filt) == key(plain)


def test_allow_nothing_yields_no_rows(spark, fidx, tiny_queries):
    d, _, _ = fidx
    qdf = spark.createDataFrame(tiny_queries[:5])
    assert _run(spark, d, qdf, []) == []


def test_min_match_matches_oracle(spark, fidx, tiny_queries):
    """min_match=2 must rank exactly the docs containing ≥2 distinct query
    terms, scored identically to the unconstrained oracle."""
    from colbert_spark.functions.tokenizer import py_tokenize

    d, oracle, _ = fidx
    qdf = spark.createDataFrame(tiny_queries[:12])
    rows = IndexSearcher(spark, d).search(qdf, k=K, min_match=2).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, q in zip(tiny_queries["qid"][:12], tiny_queries["question"][:12]):
        terms = set(py_tokenize(q))
        term_docs = {
            t: {d2 for d2, _ in oracle.postings.get(t, [])} for t in terms
        }
        scores = oracle.score_all(q)
        eligible = {
            doc for doc in scores
            if sum(doc in term_docs[t] for t in terms) >= 2
        }
        want = sorted(
            ((d2, s) for d2, s in scores.items() if d2 in eligible),
            key=lambda kv: (-kv[1], kv[0]),
        )[:K]
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], f"qid={qid}"
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9)


def test_min_match_all_terms_is_scored_boolean_and(spark, fidx, tiny_queries):
    """min_match == #distinct-query-terms keeps only docs containing every
    term (scored boolean-AND)."""
    from colbert_spark.functions.tokenizer import py_tokenize

    d, oracle, _ = fidx
    sel = tiny_queries[:20]
    multi = [
        (qid, q)
        for qid, q in zip(sel["qid"], sel["question"])
        if len(set(py_tokenize(q))) >= 2
    ][:5]
    from colbert_spark.query.wand import MATCH_ALL

    key = lambda rows: sorted((r["qid"], r["rank"], r["doc_id"]) for r in rows)
    for qid, q in multi:
        m = len(set(py_tokenize(q)))
        qdf = spark.createDataFrame([(qid, q)], "qid long, question string")
        rows = IndexSearcher(spark, d).search(qdf, k=K, min_match=m).collect()
        for r in rows:
            for t in set(py_tokenize(q)):
                assert any(
                    r["doc_id"] == d2 for d2, _ in oracle.postings.get(t, [])
                ), (qid, t, r["doc_id"])
        # the MATCH_ALL sentinel must agree with the explicit threshold
        # (these queries have no OOV tokens, so the strict drop is a no-op)
        rows_all = IndexSearcher(spark, d).search(
            qdf, k=K, min_match=MATCH_ALL
        ).collect()
        assert key(rows_all) == key(rows)


def test_match_all_oov_query_returns_nothing(spark, fidx):
    from colbert_spark.query.wand import MATCH_ALL

    d, _, _ = fidx
    qdf = spark.createDataFrame(
        [(0, "term00000 zzzznotavocabword")], "qid long, question string"
    )
    assert IndexSearcher(spark, d).search(qdf, k=K, min_match=MATCH_ALL).count() == 0
    # same query disjunctively still matches
    assert IndexSearcher(spark, d).search(qdf, k=K).count() > 0


def test_sparse_filter_ranks_deep_docs(spark, fidx, tiny_queries):
    """A 1% filter must surface docs the unfiltered top-k never shows."""
    d, oracle, n = fidx
    allowed = set(range(0, n, 97))
    qdf = spark.createDataFrame(tiny_queries[:5])
    rows = _run(spark, d, qdf, allowed)
    assert rows, "expected some filtered hits"
    for r in rows:
        assert r["doc_id"] in allowed
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, q in zip(tiny_queries["qid"][:5], tiny_queries["question"][:5]):
        want = _golden_filtered(oracle, q, allowed)
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], f"qid={qid}"
