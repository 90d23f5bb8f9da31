"""Large-tombstone (cogrouped) masking — the round-2 driver-memory cliff.

Past `IndexSearcher(tomb_broadcast_max)` the pending-delete set must never
be collected to the driver or broadcast: BM25/LM search mask through a
per-bucket cogroup (`wand.make_masked_kernel`), uncut match sets through
exact post-kernel anti-joins. `tomb_broadcast_max=0` forces the distributed
path on a small corpus, so every assertion is rank-identity against the
(broadcast-path) searcher AND the semantics contract: results equal a
search over the survivors with encode-time statistics.

Deletes >50% of the corpus (the VERDICT round-3 bar) so the mask genuinely
reshapes every ranking.
"""

import math

import pytest
from pyspark.sql import functions as F

from colbert_spark.index.build import build_index
from colbert_spark.index.delete import delete_docs
from colbert_spark.query.lm import lm_topk_segments
from colbert_spark.query.wand import MATCH_ALL, IndexSearcher

K = 10
N_DOCS = 1000


@pytest.fixture(scope="module")
def big_del_index(spark, tiny_corpus, tmp_path_factory):
    """Index over the 1k corpus with 55% of docs tombstoned (every doc_id
    not ≡ 0 mod 20, plus the even half — survivors = odd multiples of 5
    and ids ≡ 0 mod 20 … concretely: keep doc_id % 9 ∈ {0, 2, 5, 7}, delete
    the rest ⇒ 556/1000 deleted)."""
    d = str(tmp_path_factory.mktemp("idx_bigdel"))
    build_index(spark, spark.createDataFrame(tiny_corpus), d, bucket_size=127)
    dead = [(i,) for i in range(N_DOCS) if i % 9 not in (0, 2, 5, 7)]
    assert len(dead) > N_DOCS // 2
    delete_docs(spark, d, spark.createDataFrame(dead, "doc_id long"))
    return d, {i for (i,) in dead}


def _searchers(spark, d):
    small = IndexSearcher(spark, d)  # broadcast path (default threshold)
    big = IndexSearcher(spark, d, tomb_broadcast_max=0)  # forced cogroup
    assert small._tomb is not None and small._tomb_df is None
    assert big._tomb is None and big._tomb_df is not None
    return small, big


def _key(rows):
    return sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in rows
    )


def test_cogroup_search_rank_identical_and_masked(
    spark, big_del_index, tiny_queries
):
    d, dead = big_del_index
    small, big = _searchers(spark, d)
    qs = spark.createDataFrame(tiny_queries[:15])
    a = small.search(qs, k=K).collect()
    b = big.search(qs, k=K).collect()
    assert _key(a) == _key(b)
    assert all(r["doc_id"] not in dead for r in b)
    assert len(b) > 0


def test_cogroup_search_min_match_and_match_all(
    spark, big_del_index, tiny_queries
):
    d, dead = big_del_index
    small, big = _searchers(spark, d)
    qs = spark.createDataFrame(tiny_queries[:10])
    for mm in (2, MATCH_ALL):
        a = small.search(qs, k=K, min_match=mm).collect()
        b = big.search(qs, k=K, min_match=mm).collect()
        assert _key(a) == _key(b), f"min_match={mm}"
        assert all(r["doc_id"] not in dead for r in b)


def test_cogroup_search_exclude_terms(spark, big_del_index, tiny_queries):
    """Boolean must_not still applies on the cogrouped path (neg_map rides
    the payload; tombstones ride the cogroup)."""
    d, dead = big_del_index
    small, big = _searchers(spark, d)
    qpdf = tiny_queries[:8].copy()
    qpdf["exclude"] = [q.split()[0] for q in tiny_queries["question"][1:9]]
    qs = spark.createDataFrame(qpdf)
    a = small.search(qs, k=K).collect()
    b = big.search(qs, k=K).collect()
    assert _key(a) == _key(b)
    assert all(r["doc_id"] not in dead for r in b)


def test_cogroup_uncut_paths_and_filtered(spark, big_del_index, tiny_queries):
    d, dead = big_del_index
    small, big = _searchers(spark, d)
    qs = spark.createDataFrame(tiny_queries[:6])

    sm = {(r["qid"], r["doc_id"], round(r["score"], 9))
          for r in small.score_matches(qs).collect()}
    bg = {(r["qid"], r["doc_id"], round(r["score"], 9))
          for r in big.score_matches(qs).collect()}
    assert sm == bg and all(doc not in dead for _, doc, _ in bg)

    sm = {(r["qid"], r["doc_id"]) for r in small.matching_docs(qs).collect()}
    bg = {(r["qid"], r["doc_id"]) for r in big.matching_docs(qs).collect()}
    assert sm == bg and all(doc not in dead for _, doc in bg)

    allowed = spark.createDataFrame(
        [(i,) for i in range(0, N_DOCS, 3)], "doc_id long"
    )
    a = small.search_filtered(qs, allowed, k=K).collect()
    b = big.search_filtered(qs, allowed, k=K).collect()
    assert _key(a) == _key(b)
    assert all(r["doc_id"] not in dead and r["doc_id"] % 3 == 0 for r in b)

    # explain prices exactly what search scored, through the anti-joined
    # candidate set
    topk = big.search(qs, k=3)
    ex = big.explain(qs, topk.select("qid", "doc_id")).collect()
    by_doc = {}
    for r in ex:
        by_doc.setdefault((r["qid"], r["doc_id"]), 0.0)
        by_doc[(r["qid"], r["doc_id"])] += r["contrib"]
    scores = {(r["qid"], r["doc_id"]): r["score"] for r in topk.collect()}
    assert set(by_doc) == set(scores)
    for key, s in scores.items():
        assert math.isclose(by_doc[key], s, rel_tol=1e-9)


def test_cogroup_lm_rank_identical(spark, big_del_index, tiny_queries):
    d, dead = big_del_index
    qs = spark.createDataFrame(tiny_queries[:10])
    a = lm_topk_segments(spark, d, qs, k=K).collect()
    b = lm_topk_segments(spark, d, qs, k=K, tomb_broadcast_max=0).collect()
    assert _key(a) == _key(b)
    assert all(r["doc_id"] not in dead for r in b)


def test_no_driver_collect_of_tombstones(spark, big_del_index, tiny_queries):
    """The contract itself: on the forced-cogroup searcher the tombstone set
    exists only as a DataFrame — loading it as an ndarray never happens, and
    a search schedules no job that collects it (asserted structurally: the
    searcher holds no materialized set, and the plan of the partial contains
    a cogrouped FlatMapCoGroupsInPandas over the tombstone scan)."""
    d, _ = big_del_index
    big = IndexSearcher(spark, d, tomb_broadcast_max=0)
    assert big._tomb is None
    qs = spark.createDataFrame(tiny_queries[:3])
    df = big.search(qs, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
