"""Query-kernel memory contract (SCALE.md §query).

The BM25 scoring kernels' resident DECODED postings are capped by an LRU
budget (`_DecodeBudget`, default 1 GiB/task): a batch's term set × a dense
bucket can otherwise decode more than executor memory. Under the cap the
kernel degrades to recompute-per-use — results must be BIT-IDENTICAL, only
slower. These tests prove (1) the accounting/eviction arithmetic, and
(2) end-to-end rank-identity with a cap small enough that essentially every
term is evicted and re-decoded between queries.
"""

from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from colbert_spark.index.build import build_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.wand import IndexSearcher, _DecodeBudget

K = 10


def _fake_tb(n: int):
    """Object shaped like a _TermBlocks holding an n-posting decoded cache
    (the budget only reads `_full` and identity)."""
    return SimpleNamespace(
        _full=(np.zeros(n, np.int64), np.zeros(n, np.float64))
    )


class TestDecodeBudget:
    def test_admit_and_evict_lru(self):
        budget = _DecodeBudget(cap=3 * 16 * 100)  # room for 3 × 100-posting terms
        tbs = [_fake_tb(100) for _ in range(4)]
        for tb in tbs[:3]:
            budget.admit(tb)
        assert budget.evictions == 0 and budget.used == 3 * 1600
        budget.touch(tbs[0])  # 0 becomes MRU; 1 is now LRU
        budget.admit(tbs[3])
        assert budget.evictions == 1
        assert tbs[1]._full is None  # the LRU victim
        assert tbs[0]._full is not None and tbs[2]._full is not None
        assert budget.used == 3 * 1600
        assert budget.peak == 4 * 1600

    def test_readmit_does_not_double_count(self):
        budget = _DecodeBudget(cap=1 << 20)
        tb = _fake_tb(50)
        budget.admit(tb)
        budget.admit(tb)  # re-admission after an eviction/recompute cycle
        assert budget.used == 50 * 16

    def test_oversized_single_term_is_never_evicted(self):
        budget = _DecodeBudget(cap=10)  # smaller than any real term
        tb = _fake_tb(1000)
        budget.admit(tb)
        assert tb._full is not None  # floor: the current term always resides
        other = _fake_tb(1000)
        budget.admit(other)
        assert other._full is not None  # new current term resides...
        assert tb._full is None  # ...and the previous one was evicted


@pytest.fixture(scope="module")
def index_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_mem"))
    build_index(spark, spark.createDataFrame(tiny_corpus), d, bucket_size=127)
    return d


@pytest.fixture(scope="module")
def golden(tiny_corpus, tiny_queries):
    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    return {
        qid: oracle.topk(q, K)
        for qid, q in zip(tiny_queries["qid"], tiny_queries["question"])
    }


def test_rank_identity_under_starved_decode_cache(
    spark, index_dir, tiny_queries, golden
):
    """4 KiB cap ≈ a couple hundred decoded postings: every term of every
    query is evicted and re-decoded continuously. The dense pass must still
    match the pure-Python oracle doc-for-doc, score-for-score — the cap may
    cost time, never correctness."""
    s = IndexSearcher(spark, index_dir)
    s.decode_cache_bytes = 1 << 12
    qdf = spark.createDataFrame(tiny_queries)
    rows = s.search(qdf, k=K).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    import math

    for qid, expected in golden.items():
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert len(got) == len(expected), f"qid={qid}"
        for (exp_doc, exp_score), row in zip(expected, got):
            assert row["doc_id"] == exp_doc, f"qid={qid}"
            assert math.isclose(row["score"], exp_score, rel_tol=1e-9)
