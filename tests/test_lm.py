"""QL-Dirichlet ranking (`query/lm.py`) vs a brute-force pure-Python
computation of the same formula over the same tokenizer grammar — exact doc
sets, rank order, and float64 scores (the kernel accumulates in ascending
term_id order == lexicographic term order, which this oracle reproduces)."""

import math
from collections import Counter

import pytest

from colbert_spark.functions.tokenizer import py_tokenize
from colbert_spark.index.build import build_index
from colbert_spark.query.lm import lm_topk_segments

MU = 2000.0
K = 10


@pytest.fixture(scope="module")
def lm_setup(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_lm"))
    base = tiny_corpus.iloc[:600]
    build_index(spark, spark.createDataFrame(base), d, bucket_size=131)
    ordered = base.sort_values("url").reset_index(drop=True)
    toks = [py_tokenize(t) for t in ordered["text"]]
    cf = Counter(t for tk in toks for t in tk)
    c_total = float(sum(cf.values()))
    return d, toks, cf, c_total


def _oracle_lm(toks, cf, c_total, question, k=K):
    qtf = Counter(t for t in py_tokenize(question) if t in cf)
    if not qtf:
        return []
    nq = float(sum(qtf.values()))
    scores = {}
    for doc, tk in enumerate(toks):
        tf = Counter(tk)
        # ascending term order == the kernel's accumulation order
        ml = 0.0
        for t in sorted(qtf):
            if tf.get(t):
                ml += qtf[t] * math.log1p(tf[t] / (MU * cf[t] / c_total))
        if ml > 0.0:
            scores[doc] = ml + nq * math.log(MU / (len(tk) + MU))
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_lm_matches_bruteforce(spark, lm_setup, tiny_queries):
    d, toks, cf, c_total = lm_setup
    qdf = spark.createDataFrame(tiny_queries[:15])
    rows = lm_topk_segments(spark, d, qdf, k=K, mu=MU).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    non_empty = 0
    for qid, q in zip(tiny_queries["qid"][:15], tiny_queries["question"][:15]):
        want = _oracle_lm(toks, cf, c_total, q)
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want], f"qid={qid}"
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9)
        non_empty += bool(want)
    assert non_empty >= 10  # the query set actually exercises the scorer


def test_lm_absent_terms_yield_nothing(spark, lm_setup):
    d, _, _, _ = lm_setup
    qdf = spark.createDataFrame(
        [(0, "zzzzabsent qqqqmissing"), (1, "!!! ...")],
        "qid long, question string",
    )
    assert lm_topk_segments(spark, d, qdf, k=K).count() == 0
